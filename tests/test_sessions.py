import pytest

from kgforge.datapipe.sessions import funnel_steps, retention_cohorts, sessionize


def test_sessionize_gap_boundary(spark):
    # delta == gap stays in session; delta > gap opens one
    rows = [("u", 0), ("u", 100), ("u", 201), ("u", 301)]
    df = spark.createDataFrame(rows, "u string, t int")
    got = {
        (r["session_idx"], r["start_ts"], r["end_ts"], r["n_events"], r["duration"])
        for r in sessionize(df, "u", "t", 100).collect()
    }
    assert got == {(1, 0, 100, 2, 100), (2, 201, 301, 2, 100)}


def test_sessionize_partition_invariant(spark):
    rows = [("u%d" % (i % 7), (i * 997) % 5000) for i in range(400)]
    df = spark.createDataFrame(rows, "u string, t int")
    a = sorted(map(tuple, sessionize(df.repartition(1), "u", "t", 50).collect()))
    b = sorted(map(tuple, sessionize(df.repartition(16), "u", "t", 50).collect()))
    assert a == b and len(a) > 7


def _funnel_ref(events_by_user, steps):
    """Greedy sequential-match depth per user, then cumulative counts."""
    depths = []
    for evs in events_by_user.values():
        depth = 0
        for _, e in sorted(
            (t, steps.index(e)) for t, e in evs if e in steps
        ):
            if e == depth:
                depth += 1
        depths.append(depth)
    return [sum(1 for d in depths if d >= i) for i in range(1, len(steps) + 1)]


def test_funnel_greedy_sequencing(spark):
    # u1 completes all; u2 skips click (buy before click does not count);
    # u3 clicks without viewing (depth 0); u4 view->click out of order events
    data = {
        "u1": [(0, "view"), (1, "click"), (2, "buy")],
        "u2": [(0, "view"), (1, "buy")],
        "u3": [(0, "click"), (1, "buy")],
        "u4": [(5, "click"), (6, "view"), (7, "click"), (8, "buy")],
    }
    rows = [(u, t, e) for u, evs in data.items() for t, e in evs]
    df = spark.createDataFrame(rows, "u string, t int, e string")
    steps = ["view", "click", "buy"]
    got = {
        r["step_idx"]: (r["n_reached"], r["frac_of_entered"], r["frac_of_prev"])
        for r in funnel_steps(df, "u", "t", "e", steps).collect()
    }
    want = _funnel_ref(data, steps)
    assert [got[i + 1][0] for i in range(3)] == want == [3, 2, 2]
    assert got[1] == (3, 1.0, 1.0)
    assert got[2] == (2, round(2 / 3, 6), round(2 / 3, 6))
    assert got[3] == (2, round(2 / 3, 6), 1.0)


def test_funnel_empty_step_level(spark):
    # nobody reaches click or buy -> rows still present with 0 / NULL fracs
    df = spark.createDataFrame([("u", 0, "view")], "u string, t int, e string")
    got = {
        r["step_idx"]: (r["n_reached"], r["frac_of_entered"], r["frac_of_prev"])
        for r in funnel_steps(df, "u", "t", "e", ["view", "click", "buy"]).collect()
    }
    assert got[1] == (1, 1.0, 1.0)
    assert got[2] == (0, 0.0, 0.0)
    assert got[3] == (0, 0.0, None)  # prev count 0 -> NULL


def test_funnel_validates_args(spark):
    df = spark.createDataFrame([("u", 0, "a")], "u string, t int, e string")
    with pytest.raises(ValueError):
        funnel_steps(df, "u", "t", "e", [])
    with pytest.raises(ValueError):
        funnel_steps(df, "u", "t", "e", ["a", "a"])


def test_retention_matrix(spark):
    # cohort 0: u1 (periods 0,2), u2 (0,1); cohort 1: u3 (1)
    rows = [("u1", 5), ("u1", 25), ("u2", 9), ("u2", 12), ("u3", 17)]
    df = spark.createDataFrame(rows, "u string, t int")
    got = {
        (r["cohort"], r["offset"]): (r["n_active"], r["cohort_size"], r["retention"])
        for r in retention_cohorts(df, "u", "t", 10).collect()
    }
    assert got[(0, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (1, 2, 0.5)
    assert got[(0, 2)] == (1, 2, 0.5)
    assert got[(1, 0)] == (1, 1, 1.0)
    assert (1, 1) not in got  # no activity -> no cell (sparse matrix)
