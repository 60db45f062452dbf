"""VoID statistics vs a hand-computed golden."""

from __future__ import annotations

import pytest

from kgforge.kg.voidstats import void_statistics
from kgforge.triples import triples_df

EX = "http://ex.org/"


@pytest.fixture(scope="module")
def graph(spark):
    rows = [
        (EX + "a", EX + "name", "Ada", "string", False),
        (EX + "b", EX + "name", "Ada", "string", False),
        (EX + "a", EX + "knows", EX + "b", "iri", True),
        (EX + "a", EX + "knows", EX + "c", "iri", True),
        (EX + "b", EX + "knows", EX + "c", "iri", True),
    ]
    return triples_df(spark, rows).persist()


def test_predicate_partition(spark, graph):
    got = {
        r["pred"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
        for r in void_statistics(graph).collect()
    }
    assert got[EX + "name"] == (2, 2, 1)
    assert got[EX + "knows"] == (3, 2, 2)
    assert got["*"] == (5, 2, 3)


def test_no_total(spark, graph):
    preds = {r["pred"] for r in void_statistics(graph, include_total=False).collect()}
    assert preds == {EX + "name", EX + "knows"}


def test_approx_close(spark, graph):
    exact = {r["pred"]: r["n_subjects"] for r in void_statistics(graph).collect()}
    approx = {
        r["pred"]: r["n_subjects"]
        for r in void_statistics(graph, approx=True).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(1, v * 0.1)
