"""node2vec-style biased walks vs the python mirror."""

from __future__ import annotations

import random

import pytest

from kgforge.kg.walks import _py_biased_walks, _py_walks, biased_random_walks


def _collect(df):
    return sorted(
        (r["start"], r["walk"], r["step"], r["node"]) for r in df.collect()
    )


def test_matches_mirror(spark):
    rnd = random.Random(61)
    edges = sorted({tuple(sorted(rnd.sample(range(25), 2))) for _ in range(70)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _collect(
        biased_random_walks(
            df, n_walks=2, length=3, seed=7, w_return=1, w_common=4, w_far=2
        )
    )
    assert got == _py_biased_walks(edges, 2, 3, 7, 1, 4, 2)


def test_uniform_weights_match_first_order_mirror(spark):
    rnd = random.Random(67)
    edges = sorted({tuple(sorted(rnd.sample(range(20), 2))) for _ in range(50)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _collect(
        biased_random_walks(df, n_walks=1, length=3, seed=5,
                            w_return=1, w_common=1, w_far=1)
    )
    assert got == _py_biased_walks(edges, 1, 3, 5, 1, 1, 1)


def test_bias_changes_walks_and_stays_valid(spark):
    rnd = random.Random(71)
    edges = sorted({tuple(sorted(rnd.sample(range(20), 2))) for _ in range(60)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = _collect(biased_random_walks(df, n_walks=1, length=4, seed=3,
                                     w_return=10, w_common=1, w_far=1))
    b = _collect(biased_random_walks(df, n_walks=1, length=4, seed=3,
                                     w_return=1, w_common=1, w_far=10))
    assert a != b
    nbrs: dict = {}
    for x, y in edges:
        nbrs.setdefault(x, set()).add(y)
        nbrs.setdefault(y, set()).add(x)
    for rows in (a, b):
        walks: dict = {}
        for start, w, step, node in rows:
            walks.setdefault((start, w), {})[step] = node
        for (start, _), steps in walks.items():
            assert steps[0] == start
            for s in range(1, 5):
                assert steps[s] in nbrs[steps[s - 1]]


def test_string_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _collect(biased_random_walks(df, n_walks=2, length=3, seed=1,
                                       w_return=1, w_common=3, w_far=2))
    assert got == _py_biased_walks(edges, 2, 3, 1, 1, 3, 2)
