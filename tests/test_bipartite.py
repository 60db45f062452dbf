import pytest

from kgforge.kg.bipartite import bipartiteness


def _mirror_is_bipartite(edges):
    """Brute 2-coloring per component over string ids."""
    adj = {}
    for a, b in edges:
        a, b = str(a), str(b)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    color, res = {}, {}
    for start in sorted(adj):
        if start in color:
            continue
        comp_nodes, ok = [], True
        color[start] = 0
        stack = [start]
        while stack:
            u = stack.pop()
            comp_nodes.append(u)
            for v in adj[u]:
                if v == u:
                    ok = False
                    continue
                if v not in color:
                    color[v] = color[u] ^ 1
                    stack.append(v)
                elif color[v] == color[u]:
                    ok = False
        res[min(comp_nodes)] = (len(set(comp_nodes)), ok)
    return res


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src int, dst int")
    got = bipartiteness(df).collect()
    return {r["comp"]: (r["n_nodes"], r["is_bipartite"]) for r in got}


def test_even_cycle_and_odd_cycle(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1),      # C4: bipartite
             (10, 11), (11, 12), (12, 10)]        # C3: odd cycle
    got = _run(spark, edges)
    assert got == _mirror_is_bipartite(edges)
    assert got["1"] == (4, True)
    assert got["10"] == (3, False)


def test_tree_is_bipartite(spark):
    edges = [(1, 2), (1, 3), (2, 4), (2, 5), (3, 6)]
    got = _run(spark, edges)
    assert got == {"1": (6, True)}


def test_self_loop_marks_non_bipartite(spark):
    edges = [(1, 2), (2, 2)]
    got = _run(spark, edges)
    assert got == {"1": (2, False)}


def test_isolated_self_loop_component(spark):
    edges = [(5, 5), (1, 2)]
    got = _run(spark, edges)
    assert got == {"1": (2, True), "5": (1, False)}


def test_mixed_matches_mirror(spark):
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (6, 7), (7, 8), (8, 9), (9, 6),
             (9, 7)]  # square with a chord -> odd cycle
    got = _run(spark, edges)
    want = _mirror_is_bipartite(edges)
    assert got == want
