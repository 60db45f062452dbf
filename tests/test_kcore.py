"""k-core peel vs the plain-python mirror + structural goldens."""

from __future__ import annotations

import random

import pytest

from kgforge.kg.kcore import _driver_kcore, k_core


def _collect(df):
    return sorted((r["node"], r["deg"]) for r in df.collect())


def test_clique_plus_tail(spark):
    # K5 (a 4-core) with a pendant path hanging off it
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got3 = _collect(k_core(df, k=3))
    # the path peels away over several rounds; only K5 survives, deg 4 each
    assert got3 == [(i, 4) for i in range(5)]
    got2 = _collect(k_core(df, k=2))
    assert got2 == _driver_kcore(edges, 2) == [(i, 4) for i in range(5)]


def test_empty_core(spark):
    edges = [(0, 1), (1, 2), (2, 3)]  # a path has no 2-core
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    assert _collect(k_core(df, k=2)) == []
    assert _driver_kcore(edges, 2) == []


def test_matches_mirror_on_random_graph(spark):
    rnd = random.Random(23)
    edges = sorted({tuple(sorted(rnd.sample(range(50), 2))) for _ in range(170)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    for k in (2, 3, 4, 5):
        assert _collect(k_core(df, k=k)) == _driver_kcore(edges, k)


def test_driver_path_agrees_with_distributed(spark):
    rnd = random.Random(29)
    edges = sorted({tuple(sorted(rnd.sample(range(40), 2))) for _ in range(130)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    fast = _collect(k_core(df, k=3, driver_threshold=10**6))
    slow = _collect(k_core(df, k=3))
    assert fast == slow


def test_capped_rounds_is_partial_peel(spark):
    # a long path: k=2 peels exactly one layer (both endpoints) per round
    edges = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _collect(k_core(df, k=2, max_rounds=1))
    # after one peel round nodes 0 and 8 are gone; degrees of the shorter path
    want = [(1, 1), (2, 2), (3, 2), (4, 2), (5, 2), (6, 2), (7, 1)]
    assert got == want
