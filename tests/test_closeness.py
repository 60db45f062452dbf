"""Multi-source pairwise distances + closeness vs python mirrors."""

from __future__ import annotations

import random
from collections import deque

import pytest

from kgforge.kg.paths import closeness, pairwise_distances


def _py_bfs(edges, sources, directed):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(str(a), set()).add(str(b))
        if not directed:
            adj.setdefault(str(b), set()).add(str(a))
    out = {}
    for s in sources:
        s = str(s)
        dist = {s: 0}
        dq = deque([s])
        while dq:
            v = dq.popleft()
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    dq.append(w)
        for v, d in dist.items():
            out[(s, v)] = d
    return out


@pytest.mark.slow
def test_matches_bfs_mirror(spark):
    rnd = random.Random(17)
    edges = sorted({(rnd.randrange(25), rnd.randrange(25)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    sources = [0, 3, 7]
    for directed in (True, False):
        got = {
            (r["source"], r["id"]): r["distance"]
            for r in pairwise_distances(df, sources, directed=directed).collect()
        }
        assert got == _py_bfs(edges, sources, directed)


def test_closeness_path_graph(spark):
    # path 0-1-2-3: closeness(0) = 3/(1+2+3), harmonic(0) = 1 + 1/2 + 1/3
    edges = [(0, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["source"]: (r["n_reached"], r["total_dist"], r["closeness"], r["harmonic"])
        for r in closeness(df, [0, 1], directed=False).collect()
    }
    assert got["0"][0] == 3 and got["0"][1] == 6
    assert got["0"][2] == pytest.approx(0.5)
    assert got["0"][3] == pytest.approx(1 + 0.5 + 1 / 3)
    assert got["1"] == (3, 4, pytest.approx(0.75), pytest.approx(2.5))


def test_isolated_source_zeroes(spark):
    edges = [(0, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["source"]: (r["n_reached"], r["closeness"], r["harmonic"])
        for r in closeness(df, [1], directed=True).collect()
    }
    assert got["1"] == (0, 0.0, 0.0)


def test_eccentricity_path_graph(spark):
    from kgforge.kg.paths import eccentricity

    # path 0-1-2-3: ecc = 3, 2, 2, 3; diameter 3, radius 2
    edges = [(0, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["source"]: (r["ecc"], r["n_reached"])
        for r in eccentricity(df, [0, 1, 2, 3], directed=False).collect()
    }
    assert got == {"0": (3, 3), "1": (2, 3), "2": (2, 3), "3": (3, 3)}


def test_eccentricity_directed_and_isolated(spark):
    from kgforge.kg.paths import eccentricity

    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["source"]: (r["ecc"], r["n_reached"])
        for r in eccentricity(df, [0, 2], directed=True).collect()
    }
    # 2 reaches nothing in the directed graph: ecc 0, n_reached 0
    assert got == {"0": (2, 2), "2": (0, 0)}
