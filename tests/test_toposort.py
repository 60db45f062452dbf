import pytest

from kgforge.kg.toposort import topological_layers


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = topological_layers(df, **kw).collect()
    return {r["node"]: (r["layer"], r["is_cyclic"]) for r in got}


def test_diamond_dag_layers_are_longest_path(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("b", "c")]
    # longest paths: a=0, b=1, c=2 (via b), d=3
    assert _run(spark, edges) == {
        "a": (0, False), "b": (1, False), "c": (2, False), "d": (3, False),
    }


def test_cycle_flagged_and_upstream_dag_ordered(spark):
    edges = [("s", "x"), ("x", "y"), ("y", "z"), ("z", "x")]
    got = _run(spark, edges)
    assert got["s"] == (0, False)
    assert got["x"] == (None, True)
    assert got["y"] == (None, True)
    assert got["z"] == (None, True)


def test_self_loop_is_cycle(spark):
    got = _run(spark, [("a", "a"), ("a", "b")])
    assert got == {"a": (None, True), "b": (None, True)}


def test_node_after_cycle_is_locked(spark):
    edges = [("p", "q"), ("q", "p"), ("q", "r")]
    got = _run(spark, edges)
    assert got == {"p": (None, True), "q": (None, True), "r": (None, True)}


def test_forest_of_chains(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    assert _run(spark, edges) == {
        "a": (0, False), "b": (1, False), "c": (2, False),
        "x": (0, False), "y": (1, False),
    }


def test_depth_beyond_max_iter_raises(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(6)]
    with pytest.raises(ValueError, match="deeper"):
        topological_layers(
            spark.createDataFrame(edges, "src string, dst string"),
            max_iter=3,
        )
