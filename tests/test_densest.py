import pytest

from kgforge.kg.densest import densest_subgraph


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = densest_subgraph(df, **kw).collect()
    nodes = {r["node"] for r in got}
    stats = {(r["v_best"], r["e_best"]) for r in got}
    assert len(stats) <= 1
    return nodes, (stats.pop() if stats else None)


def test_clique_plus_pendant_chain(spark):
    # K5 (density 2.0) with a long pendant path dragging global density
    # down; a tight multiplier (2.2) peels the path first and the best
    # tracked state is exactly the clique
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    path = [("c0", "p0")] + [(f"p{i}", f"p{i+1}") for i in range(6)]
    nodes, (v, e) = _run(spark, clique + path, numer=11, denom=5)
    assert nodes == {f"c{i}" for i in range(5)}
    assert (v, e) == (5, 10)


def test_whole_graph_when_uniformly_dense(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    nodes, (v, e) = _run(spark, edges)
    assert nodes == {"a", "b", "c"} and (v, e) == (3, 3)


def test_density_at_least_third_of_best(spark):
    # guarantee check on a two-blob graph: K6 blob + sparse star
    k6 = [(f"k{i}", f"k{j}") for i in range(6) for j in range(i + 1, 6)]
    star = [("s", f"t{i}") for i in range(8)]
    nodes, (v, e) = _run(spark, k6 + star + [("k0", "s")])
    # optimum is K6 with density 15/6 = 2.5; 3-approx must return >= 2.5/3
    assert e / v >= 2.5 / 3
    assert {f"k{i}" for i in range(6)} <= nodes


def test_empty_and_self_loop_only(spark):
    df = spark.createDataFrame([("x", "x")], "src string, dst string")
    assert densest_subgraph(df).count() == 0


def test_bad_multiplier_rejected(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        densest_subgraph(df, numer=2, denom=1)
