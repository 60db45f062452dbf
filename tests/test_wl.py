"""Weisfeiler-Leman colors vs the python mirror + structural invariants."""

from __future__ import annotations

import random

import pytest

from kgforge.kg.wl import _py_wl, wl_colors


def _collect(df):
    return {r["node"]: r["color"] for r in df.collect()}


def test_matches_mirror(spark):
    rnd = random.Random(83)
    edges = sorted({tuple(sorted(rnd.sample(range(30), 2))) for _ in range(80)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    for rounds in (1, 3):
        assert _collect(wl_colors(df, rounds=rounds)) == _py_wl(edges, rounds)


def test_symmetric_positions_share_colors(spark):
    # a path 0-1-2-3-4: endpoints {0,4} and inner {1,3} are symmetric;
    # the center 2 is structurally unique
    edges = [(i, i + 1) for i in range(4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _collect(wl_colors(df, rounds=3))
    assert got[0] == got[4]
    assert got[1] == got[3]
    assert len({got[0], got[1], got[2]}) == 3


def test_refinement_distinguishes_regular_lookalikes(spark):
    # C6 vs two disjoint C3s: all nodes are degree-2, so color0 is uniform;
    # 1-WL on vertex colors alone cannot split regular graphs of equal
    # degree — but within one run, colors must stay uniform inside each
    # cycle (the automorphism classes)
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    c3s = [(10, 11), (11, 12), (12, 10), (20, 21), (21, 22), (22, 20)]
    df = spark.createDataFrame(c6 + c3s, "src bigint, dst bigint")
    got = _collect(wl_colors(df, rounds=3))
    assert len({got[i] for i in range(6)}) == 1
    assert len({got[i] for i in (10, 11, 12, 20, 21, 22)}) == 1


def test_feature_propagation_mirror(spark):
    import random

    from kgforge.kg.wl import feature_propagation

    rnd = random.Random(91)
    edges = sorted({tuple(sorted(rnd.sample(range(20), 2))) for _ in range(40)})
    feats = [(i, float(i % 7)) for i in range(20)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    f = spark.createDataFrame(feats, "node bigint, f double")
    got = {
        r["node"]: r["f"]
        for r in feature_propagation(e, f, hops=2).collect()
    }
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    cur = {i: float(i % 7) for i in range(20)}
    for _ in range(2):
        nxt = {}
        for v in cur:
            if v in nbrs and nbrs[v]:
                m = sum(cur[u] for u in nbrs[v]) / len(nbrs[v])
                nxt[v] = round((cur[v] + m) / 2.0, 6)
            else:
                nxt[v] = round(cur[v], 6)
        cur = nxt
    for v, x in cur.items():
        assert abs(got[v] - x) < 2e-6


def test_feature_propagation_smooths(spark):
    from kgforge.kg.wl import feature_propagation

    # a clique with one outlier feature: propagation pulls it to the mean
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    feats = [(i, 0.0) for i in range(4)] + [(4, 100.0)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    f = spark.createDataFrame(feats, "node bigint, f double")
    got = {r["node"]: r["f"] for r in feature_propagation(e, f, hops=3).collect()}
    assert got[4] < 40.0
    assert all(got[i] > 1.0 for i in range(4))
