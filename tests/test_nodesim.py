"""Neighborhood-Jaccard node similarity vs a brute-force python mirror."""

from __future__ import annotations

import random

import pytest

from kgforge.kg.nodesim import node_similarity


def _py_nodesim(edges, min_sim=0.0, max_degree=None):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nbrs: dict = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out = {}
    for a in nbrs:
        for b in nbrs:
            if a >= b:
                continue
            shared = nbrs[a] & nbrs[b]
            if max_degree is not None:
                shared = {w for w in shared if len(nbrs[w]) <= max_degree}
            if not shared:
                continue
            common = len(shared)  # hub-filtered intersection (stop-word cap)
            j = common / (len(nbrs[a]) + len(nbrs[b]) - common)
            if j >= min_sim:
                out[(a, b)] = (common, j)
    return out


@pytest.fixture(scope="module")
def graph():
    rnd = random.Random(11)
    edges = set()
    for _ in range(160):
        a, b = rnd.sample(range(40), 2)
        edges.add((a, b))
    # a hub adjacent to everyone — the max_degree case
    for v in range(1, 40):
        edges.add((0, v))
    return sorted(edges)


def test_matches_python_mirror(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    got = {
        (r["a"], r["b"]): (r["common"], r["jaccard"])
        for r in node_similarity(df).collect()
    }
    want = _py_nodesim(graph)
    assert set(got) == set(want)
    for k, (c, j) in want.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(j, abs=1e-12)


def test_min_sim_prunes(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    got = {
        (r["a"], r["b"]) for r in node_similarity(df, min_sim=0.4).collect()
    }
    want = {k for k, (_, j) in _py_nodesim(graph).items() if j >= 0.4}
    assert got == want


def test_max_degree_skips_hub_wedges_keeps_true_counts(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    got = {
        (r["a"], r["b"]): (r["common"], r["jaccard"])
        for r in node_similarity(df, max_degree=20).collect()
    }
    want = _py_nodesim(graph, max_degree=20)
    assert set(got) == set(want)
    for k, (c, j) in want.items():
        assert got[k] == (c, pytest.approx(j, abs=1e-12))
    # the hub cap must actually drop some pair discovered only through node 0
    assert set(_py_nodesim(graph)) - set(want)


def test_disjoint_components_share_nothing(spark):
    edges = [(1, 2), (2, 3), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {(r["a"], r["b"]) for r in node_similarity(df).collect()}
    assert got == {(1, 3), (10, 12)}
