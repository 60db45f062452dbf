import heapq

import pytest

from kgforge.kg.paths import weighted_shortest_paths


def _dijkstra(edges, sources, directed):
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        if not directed:
            adj.setdefault(d, []).append((s, w))
    dist = {s: 0 for s in sources}
    pq = [(0, s) for s in sources]
    heapq.heapify(pq)
    while pq:
        c, u = heapq.heappop(pq)
        if c > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            nc = c + w
            if nc < dist.get(v, 1 << 60):
                dist[v] = nc
                heapq.heappush(pq, (nc, v))
    return dist


def test_cheap_long_path_beats_direct_edge(spark):
    # a->z direct costs 10; a->b->c->z costs 3 over MORE hops
    edges = [("a", "z", 10), ("a", "b", 1), ("b", "c", 1), ("c", "z", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got = {
        r["id"]: r["distance"]
        for r in weighted_shortest_paths(df, ["a"]).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "z": 3}


def test_multi_source_undirected_mirror(spark):
    edges = [
        (f"n{i}", f"n{(i * 3 + 1) % 25}", 1 + (i * 7) % 5) for i in range(25)
    ] + [("n0", "n24", 2), ("n5", "n13", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got = {
        r["id"]: r["distance"]
        for r in weighted_shortest_paths(
            df, ["n0", "n7"], directed=False
        ).collect()
    }
    want = _dijkstra(edges, ["n0", "n7"], directed=False)
    assert got == want


def test_unreachable_absent_and_parallel_edge_min(spark):
    edges = [("a", "b", 5), ("a", "b", 2), ("x", "y", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got = {
        r["id"]: r["distance"]
        for r in weighted_shortest_paths(df, ["a"]).collect()
    }
    assert got == {"a": 0, "b": 2}  # min parallel edge, x/y absent


def test_negative_weight_rejected(spark):
    df = spark.createDataFrame([("a", "b", -1)], "src string, dst string, w int")
    with pytest.raises(ValueError):
        weighted_shortest_paths(df, ["a"])
