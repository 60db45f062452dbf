"""Luby MIS vs the python mirror + independence/maximality invariants."""

from __future__ import annotations

import random

import pytest

from kgforge.kg.mis import _py_mis, maximal_independent_set


def _collect(df):
    return {r["node"]: r["round"] for r in df.collect()}


@pytest.fixture(scope="module")
def graph():
    rnd = random.Random(31)
    return sorted({tuple(sorted(rnd.sample(range(40), 2))) for _ in range(130)})


def test_matches_mirror(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    got = _collect(maximal_independent_set(df))
    assert got == _py_mis(graph)


def test_independent_and_maximal(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    mis = set(_collect(maximal_independent_set(df)))
    nbrs: dict = {}
    for a, b in graph:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    # independent: no edge inside the set
    for a, b in graph:
        assert not (a in mis and b in mis)
    # maximal: every non-member has a member neighbor
    for v in nbrs:
        if v not in mis:
            assert nbrs[v] & mis


def test_string_ids_and_clique(spark):
    # a clique admits exactly one MIS member
    edges = [(f"n{i}", f"n{j}") for i in range(5) for j in range(i + 1, 5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _collect(maximal_independent_set(df))
    assert got == _py_mis(edges)
    assert len(got) == 1
