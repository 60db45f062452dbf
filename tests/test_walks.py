"""Deterministic random walks vs the plain-python mirror."""

from __future__ import annotations

import random

import pytest

from kgforge.kg.walks import _py_walks, random_walks


def _collect(df):
    return sorted(
        (r["start"], r["walk"], r["step"], r["node"]) for r in df.collect()
    )


def test_matches_mirror_on_random_graph(spark):
    rnd = random.Random(3)
    edges = sorted({tuple(sorted(rnd.sample(range(30), 2))) for _ in range(90)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _collect(random_walks(df, n_walks=2, length=3, seed=7))
    assert got == _py_walks(edges, 2, 3, 7)


def test_string_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _collect(random_walks(df, n_walks=3, length=4, seed=1))
    assert got == _py_walks(edges, 3, 4, 1)


def test_shape_and_validity(spark):
    rnd = random.Random(5)
    edges = sorted({tuple(sorted(rnd.sample(range(20), 2))) for _ in range(50)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = _collect(random_walks(df, n_walks=2, length=3, seed=7))
    nodes = {a for e in edges for a in e}
    # every (start, walk) emits exactly length+1 steps; every step lands on
    # a real neighbor of the previous node
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    assert len(rows) == len(nodes) * 2 * 4
    walks: dict = {}
    for start, w, step, node in rows:
        walks.setdefault((start, w), {})[step] = node
    for (start, _), steps in walks.items():
        assert steps[0] == start
        assert sorted(steps) == [0, 1, 2, 3]
        for s in range(1, 4):
            assert steps[s] in nbrs[steps[s - 1]]


def test_seed_changes_walks(spark):
    edges = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = _collect(random_walks(df, n_walks=1, length=4, seed=1))
    b = _collect(random_walks(df, n_walks=1, length=4, seed=2))
    assert a != b
