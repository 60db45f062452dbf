import random

from kgforge.kg.scc import strongly_connected_components


def _brute(edges):
    """scc(v) = min (as STRING, matching the operator's id casting) of the
    mutually-reachable set, via transitive closure."""
    nodes = sorted({str(x) for e in edges for x in e})
    es = {(str(a), str(b)) for a, b in edges if str(a) != str(b)}
    reach = {v: {v} for v in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in es:
            new = reach[b] - reach[a]
            if new:
                reach[a] |= new
                changed = True
    out = {}
    for v in nodes:
        mutual = {u for u in reach[v] if v in reach[u]}
        out[v] = min(mutual)
    return out


def _run(spark, edges):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r["node"]: r["scc"]
        for r in strongly_connected_components(e).collect()
    }


def test_two_cycles_one_way_bridge(spark):
    # cycle {0,1,2} -> bridge -> cycle {5,6}; bridge is one-way
    edges = [(0, 1), (1, 2), (2, 0), (2, 5), (5, 6), (6, 5)]
    got = _run(spark, edges)
    assert got == {"0": "0", "1": "0", "2": "0", "5": "5", "6": "5"}


def test_dag_is_all_singletons(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _run(spark, edges)
    assert got == {str(i): str(i) for i in range(4)}


def test_functional_graph_mirror(spark):
    # i -> (7i+3) mod 40 and i -> (11i+5) mod 40: rho-shaped + rich cycles
    edges = [(i, (7 * i + 3) % 40) for i in range(40)]
    edges += [(i, (11 * i + 5) % 40) for i in range(40)]
    assert _run(spark, edges) == _brute(edges)


def test_random_digraph_mirror(spark):
    rnd = random.Random(23)
    edges = sorted({(rnd.randrange(15), rnd.randrange(15)) for _ in range(35)})
    edges = [e for e in edges if e[0] != e[1]]
    assert _run(spark, edges) == _brute(edges)
