"""Degree-oriented triangle counting vs a brute-force python mirror."""

from __future__ import annotations

from itertools import combinations

import pytest

from kgforge.kg.triangles import oriented_edges, triangle_count


def _brute(edges) -> int:
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    return sum(
        1 for x, y, z in combinations(nodes, 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )


@pytest.fixture(scope="module")
def graph():
    # deterministic quasi-random graph with a hub (node 0 links everywhere)
    edges = [(0, v) for v in range(1, 40)]
    for v in range(1, 40):
        for w in range(v + 1, 40):
            if (v * 31 + w * 17) % 7 == 0:
                edges.append((v, w))
    # duplicates and reversed duplicates must not change the count
    edges += [(5, 0), (1, 2), (2, 1)]
    return edges


def test_triangles_match_brute_force(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    got = triangle_count(df).collect()[0]["n_triangles"]
    assert got == _brute(graph) > 0


def test_star_has_no_triangles(spark):
    df = spark.createDataFrame([(0, v) for v in range(1, 30)],
                               "src bigint, dst bigint")
    assert triangle_count(df).collect()[0]["n_triangles"] == 0


def test_complete_k5(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    assert triangle_count(df).collect()[0]["n_triangles"] == 10


def test_orientation_bounds_hub_out_degree(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    o = oriented_edges(df)
    out = {r["u"]: r["n"] for r in
           o.groupBy("u").count().withColumnRenamed("count", "n").collect()}
    # the hub (degree 39) must not own the wedge blowup: its out-degree is
    # bounded by its higher-degree peers, far below its raw degree
    assert out.get(0, 0) < 10


def test_clustering_coefficient(spark):
    import random

    from kgforge.kg.triangles import clustering_coefficient

    rnd = random.Random(19)
    edges = sorted({tuple(sorted(rnd.sample(range(20), 2))) for _ in range(60)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: (r["deg"], r["n_tri"], r["coeff"])
        for r in clustering_coefficient(df).collect()
    }
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for v, s in nbrs.items():
        tri = sum(
            1 for x in s for y in s if x < y and y in nbrs[x]
        )
        deg = len(s)
        coeff = 2.0 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
        assert got[v][0] == deg and got[v][1] == tri
        assert abs(got[v][2] - coeff) < 1e-12


def test_clustering_coefficient_k4(spark):
    from kgforge.kg.triangles import clustering_coefficient

    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = clustering_coefficient(df).collect()
    assert all(r["coeff"] == 1.0 and r["n_tri"] == 3 for r in rows)
