import random

from kgforge.datapipe.skyline import skyline_2d


def _mirror(rows):
    out = []
    for q in rows:
        dominated = any(
            p[1] >= q[1] and p[2] >= q[2] and (p[1] > q[1] or p[2] > q[2])
            for p in rows
        )
        if not dominated:
            out.append(q)
    return {r[0] for r in out}


def _run(spark, rows, npart=None):
    df = spark.createDataFrame(rows, "id string, x long, y long")
    got = skyline_2d(df, "x", "y", num_partitions=npart).collect()
    return {r["id"] for r in got}


def test_random_points_match_brute(spark):
    rng = random.Random(13)
    rows = [
        (f"p{i:03d}", rng.randrange(100), rng.randrange(100))
        for i in range(300)
    ]
    assert _run(spark, rows) == _mirror(rows)


def test_cross_partition_carry(spark):
    # anti-correlated staircase: EVERY point is on the frontier, and the
    # suffix-max carry crosses every partition boundary
    rows = [(f"s{i:02d}", i, 50 - i) for i in range(50)]
    assert _run(spark, rows, npart=8) == {f"s{i:02d}" for i in range(50)}


def test_ties_and_duplicates(spark):
    rows = [
        ("a", 10, 10),
        ("b", 10, 10),  # exact duplicate of a: both kept
        ("c", 10, 9),   # same x, lower y: dominated by a
        ("d", 11, 9),   # not dominated (higher x than a)
        ("e", 9, 11),   # not dominated (higher y than a)
        ("f", 9, 10),   # dominated by a (strictly lower x, equal y)
    ]
    assert _run(spark, rows) == {"a", "b", "d", "e"}
    assert _mirror(rows) == {"a", "b", "d", "e"}


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("b", None, 99), ("c", 99, None)],
        "id string, x long, y long",
    )
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    assert got == {"a"}
