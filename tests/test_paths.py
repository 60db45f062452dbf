"""BFS shortest paths: python BFS mirror on seeded random graphs, cycles,
unreachable exclusion, multi-source, undirected mode."""

import random
from collections import deque

from kgforge.kg.paths import shortest_paths


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def py_bfs(pairs, sources, directed=True):
    adj = {}
    for a, b in pairs:
        adj.setdefault(str(a), []).append(str(b))
        if not directed:
            adj.setdefault(str(b), []).append(str(a))
    dist = {str(s): 0 for s in sources}
    q = deque(sorted(dist))
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def run(spark, pairs, sources, **kw):
    out = shortest_paths(edges_df(spark, pairs), sources, **kw)
    return {r["id"]: r["distance"] for r in out.collect()}


def test_chain_and_shortcut(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert run(spark, pairs, [1]) == {"1": 0, "2": 1, "3": 2, "4": 1}


def test_cycle_terminates(spark):
    pairs = [(1, 2), (2, 3), (3, 1)]
    assert run(spark, pairs, [1]) == {"1": 0, "2": 1, "3": 2}


def test_unreachable_absent(spark):
    pairs = [(1, 2), (5, 6)]
    assert run(spark, pairs, [1]) == {"1": 0, "2": 1}


def test_multi_source_min(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (9, 4)]
    assert run(spark, pairs, [1, 9]) == {"1": 0, "9": 0, "2": 1, "3": 2, "4": 1}


def test_undirected(spark):
    pairs = [(2, 1), (2, 3)]
    assert run(spark, pairs, [1], directed=False) == {"1": 0, "2": 1, "3": 2}
    assert run(spark, pairs, [1], directed=True) == {"1": 0}


def test_random_graph_matches_python_bfs(spark):
    rnd = random.Random(20260818)
    n = 60
    pairs = {(rnd.randrange(n), rnd.randrange(n)) for _ in range(150)}
    pairs = [(a, b) for a, b in pairs if a != b]
    for directed in (True, False):
        got = run(spark, pairs, [0, 1], directed=directed)
        assert got == py_bfs(pairs, [0, 1], directed=directed)
