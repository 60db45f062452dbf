import pytest

from kgforge.datapipe.stats import groupwise_ols


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g string, x int, y int")
    out = groupwise_ols(df, ["g"], "x", "y")
    return {r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"]) for r in out.collect()}


def test_perfect_line(spark):
    rows = [("a", x, 3 * x + 7) for x in range(5)]
    got = _run(spark, rows)["a"]
    assert got == (5, 3.0, 7.0, 1.0)


def test_known_fit_matches_numpy(spark):
    import numpy as np

    xs = [1, 2, 4, 5, 7]
    ys = [3, 6, 5, 11, 12]
    got = _run(spark, [("g", x, y) for x, y in zip(xs, ys)])["g"]
    slope, intercept = np.polyfit(xs, ys, 1)
    r = np.corrcoef(xs, ys)[0, 1]
    assert got[0] == 5
    assert got[1] == pytest.approx(slope, abs=1e-6)
    assert got[2] == pytest.approx(intercept, abs=1e-6)
    assert got[3] == pytest.approx(r * r, abs=1e-6)


def test_degenerate_groups(spark):
    rows = [
        ("one", 1, 5),            # n=1 -> all null
        ("flatx", 2, 1), ("flatx", 2, 9),   # zero x-variance -> all null
        ("flaty", 1, 4), ("flaty", 3, 4),   # zero y-variance -> slope 0, r2 null
    ]
    got = _run(spark, rows)
    assert got["one"] == (1, None, None, None)
    assert got["flatx"] == (2, None, None, None)
    assert got["flaty"] == (2, 0.0, 4.0, None)


def test_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", None, 9), ("a", 2, 2), ("a", 3, None)],
        "g string, x int, y int",
    )
    out = groupwise_ols(df, ["g"], "x", "y").collect()[0]
    assert out["n"] == 2 and out["slope"] == 1.0


def test_empty_group_cols_rejected(spark):
    df = spark.createDataFrame([("a", 1, 1)], "g string, x int, y int")
    with pytest.raises(ValueError):
        groupwise_ols(df, [], "x", "y")


def test_target_encode_loo_basic(spark):
    from kgforge.datapipe.stats import target_encode_loo

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), ("b", 5), ("b", 7), ("c", 99)],
        "cat string, y int",
    )
    got = {(r["cat"], r["y"]): r["te"] for r in
           target_encode_loo(df, "cat", "y").collect()}
    assert got[("a", 10)] == 25.0      # (20+30)/2
    assert got[("a", 20)] == 20.0
    assert got[("a", 30)] == 15.0
    assert got[("b", 5)] == 7.0
    assert got[("b", 7)] == 5.0
    assert got[("c", 99)] is None      # singleton


def test_target_encode_loo_null_targets_excluded(spark):
    from kgforge.datapipe.stats import target_encode_loo

    df = spark.createDataFrame(
        [("a", 10), ("a", None), ("a", 20)], "cat string, y int"
    )
    got = {(r["cat"], r["y"]): r["te"] for r in
           target_encode_loo(df, "cat", "y").collect()}
    assert got[("a", 10)] == 20.0
    assert got[("a", 20)] == 10.0
    assert got[("a", None)] is None
