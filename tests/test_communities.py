"""Label propagation vs the plain-python mirror + structural goldens."""

from __future__ import annotations

import random

import pytest

from kgforge.kg.communities import _driver_lpa, label_propagation


def _collect(df):
    return sorted((r["node"], r["label"]) for r in df.collect())


@pytest.fixture(scope="module")
def two_cliques(spark):
    # two K6 cliques joined by one bridge edge — the textbook LPA case
    edges = []
    for base in (0, 100):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    edges.append((5, 100))
    return spark.createDataFrame(edges, "src bigint, dst bigint"), edges


def test_two_cliques_split(spark, two_cliques):
    df, edges = two_cliques
    got = _collect(label_propagation(df, iterations=4))
    assert got == _driver_lpa(sorted(edges), 4)
    labels = dict(got)
    # each clique converges to one community anchored at its min id
    assert {labels[v] for v in range(6)} == {0}
    assert {labels[v] for v in range(100, 106)} == {100}


def test_matches_mirror_on_random_graph(spark):
    rnd = random.Random(7)
    edges = sorted({tuple(sorted(rnd.sample(range(60), 2))) for _ in range(220)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    for it in (1, 3):
        assert _collect(label_propagation(df, iterations=it)) == _driver_lpa(
            edges, it
        )


def test_driver_path_agrees_with_distributed(spark):
    rnd = random.Random(13)
    edges = sorted({tuple(sorted(rnd.sample(range(40), 2))) for _ in range(120)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    fast = _collect(label_propagation(df, iterations=4, driver_threshold=10**6))
    slow = _collect(label_propagation(df, iterations=4))
    assert fast == slow


def test_string_ids_and_self_loops(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "x"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _collect(label_propagation(df, iterations=4))
    pairs = sorted({tuple(sorted(e)) for e in edges if e[0] != e[1]})
    assert got == _driver_lpa(pairs, 4)
    # self-loop-only node never appears
    assert "x" not in dict(got)
