import pytest

from kgforge.kg.hyperball import hyperball


def _exact_path_nf(n, t):
    # ordered pairs within distance t on the path 0-1-...-(n-1), self included
    return sum(min(v + t, n - 1) - max(v - t, 0) + 1 for v in range(n))


def test_path_graph_tracks_exact_counts(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], "src int, dst int")
    rows = {r["t"]: r for r in hyperball(edges, max_t=5).collect()}
    assert set(rows) == set(range(6))
    for t in range(6):
        exact = _exact_path_nf(10, t)
        assert abs(rows[t]["nf"] - exact) / exact < 0.05
    # ratio monotone, final 1.0, exactly one effective-diameter row
    ratios = [rows[t]["ratio"] for t in range(6)]
    assert ratios == sorted(ratios) and ratios[-1] == 1.0
    assert sum(1 for t in range(6) if rows[t]["reached_target"]) == 1


def test_directed_successor_balls(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], "src int, dst int")
    rows = {r["t"]: r["nf"] for r in
            hyperball(edges, max_t=3, directed=True).collect()}
    for t in range(4):
        exact = sum(min(v + t, 9) - v + 1 for v in range(10))
        assert abs(rows[t] - exact) / exact < 0.05


def test_partition_invariant_bit_exact(spark):
    import random

    rng = random.Random(11)
    e = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    df = spark.createDataFrame(e, "src int, dst int")
    a = sorted(map(tuple, hyperball(df.repartition(1), max_t=3).collect()))
    b = sorted(map(tuple, hyperball(df.repartition(16), max_t=3).collect()))
    assert a == b  # integer micro-unit sums: bit-exact, any partitioning


def test_validates_args(spark):
    df = spark.createDataFrame([(0, 1)], "src int, dst int")
    with pytest.raises(ValueError):
        hyperball(df, p=3)
    with pytest.raises(ValueError):
        hyperball(df, max_t=-1)
