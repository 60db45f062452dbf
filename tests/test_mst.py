import random

from kgforge.kg.mst import minimum_spanning_forest


def _kruskal(edges):
    """Unique MSF under the (w, a, b) total order — the python mirror."""
    canon = {}
    for s, d, w in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        canon[(a, b)] = min(canon.get((a, b), w), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got = minimum_spanning_forest(df).collect()
    return {(r["a"], r["b"], r["w"]) for r in got}


def test_triangle_drops_heaviest(spark):
    edges = [("a", "b", 1), ("b", "c", 2), ("a", "c", 3)]
    assert _run(spark, edges) == {("a", "b", 1), ("b", "c", 2)}


def test_random_graph_matches_kruskal(spark):
    rng = random.Random(7)
    edges = [
        (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}", rng.randrange(1, 50))
        for _ in range(120)
    ]
    assert _run(spark, edges) == _kruskal(edges)


def test_disconnected_forest_and_parallel_edges(spark):
    edges = [
        ("a", "b", 9),
        ("b", "a", 4),  # parallel reversed edge collapses to min
        ("x", "y", 1),
        ("y", "z", 1),
        ("x", "z", 1),  # tie: (1,x,y) and (1,x,z) win over (1,y,z)
        ("q", "q", 1),  # self-loop dropped
    ]
    assert _run(spark, edges) == {
        ("a", "b", 4),
        ("x", "y", 1),
        ("x", "z", 1),
    }


def test_chain_merges_across_rounds(spark):
    # strictly increasing chain: every edge is in the MSF; Boruvka picks
    # half per round and must relabel through multiple merges
    edges = [(f"v{i:02d}", f"v{i + 1:02d}", i + 1) for i in range(16)]
    assert _run(spark, edges) == {
        (f"v{i:02d}", f"v{i + 1:02d}", i + 1) for i in range(16)
    }
