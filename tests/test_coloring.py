import pytest
import random

from kgforge.kg.coloring import _py_coloring, greedy_coloring


def _collect(df):
    return {r["node"]: (r["color"], r["round"]) for r in df.collect()}


def test_matches_python_mirror(spark):
    rng = random.Random(5)
    pairs = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(150)})
    df = spark.createDataFrame(pairs, "src int, dst int")
    got = _collect(greedy_coloring(df))
    assert got == _py_coloring(pairs)


def test_proper_coloring(spark):
    rng = random.Random(17)
    pairs = sorted({tuple(sorted(rng.sample(range(60), 2))) for _ in range(300)})
    df = spark.createDataFrame(pairs, "src int, dst int")
    got = _collect(greedy_coloring(df))
    for a, b in pairs:
        assert got[a][0] != got[b][0], f"edge ({a},{b}) is monochromatic"
    # every node colored
    nodes = {n for e in pairs for n in e}
    assert set(got) == nodes


def test_complete_graph_uses_n_colors(spark):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k5, "src int, dst int")
    got = _collect(greedy_coloring(df))
    assert sorted(c for c, _ in got.values()) == [0, 1, 2, 3, 4]


def test_bipartite_two_colors(spark):
    # even cycle is 2-colorable; greedy JP may use more than chi but on a
    # C4 the hash order happens to be fixed — assert properness + <=3
    pairs = [(i, (i + 1) % 8) for i in range(8)]
    df = spark.createDataFrame(pairs, "src int, dst int")
    got = _collect(greedy_coloring(df))
    for a, b in pairs:
        assert got[a][0] != got[b][0]
    assert max(c for c, _ in got.values()) <= 2
    assert got == _py_coloring(pairs)


@pytest.mark.slow
def test_partition_invariant(spark):
    rng = random.Random(23)
    pairs = sorted({tuple(sorted(rng.sample(range(50), 2))) for _ in range(200)})
    df = spark.createDataFrame(pairs, "src int, dst int")
    a = _collect(greedy_coloring(df.repartition(1)))
    b = _collect(greedy_coloring(df.repartition(16)))
    assert a == b
