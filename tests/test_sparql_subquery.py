"""SPARQL 1.1 subqueries: scoping, aggregates, top-k, CONSTRUCT companions."""

from __future__ import annotations

import pytest

from kgforge.sparql import (
    SparqlError,
    sparql_construct,
    sparql_select,
)
from kgforge.triples import triples_df

EX = "http://ex.org/"


@pytest.fixture(scope="module")
def graph(spark):
    rows = [
        (EX + "d1", EX + "author", EX + "a1", "iri", True),
        (EX + "d2", EX + "author", EX + "a1", "iri", True),
        (EX + "d3", EX + "author", EX + "a2", "iri", True),
        (EX + "a1", EX + "name", "Ada", "string", False),
        (EX + "a2", EX + "name", "Grace", "string", False),
        (EX + "a3", EX + "name", "Linus", "string", False),  # no docs
        (EX + "d1", EX + "size", "10", "xsd:integer", False),
        (EX + "d2", EX + "size", "30", "xsd:integer", False),
        (EX + "d3", EX + "size", "20", "xsd:integer", False),
    ]
    return triples_df(spark, rows).persist()


def test_aggregate_subquery_joined_with_outer(graph):
    out = sparql_select(graph, f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?c WHERE {{
          {{ SELECT ?a (COUNT(?d) AS ?c) WHERE {{ ?d ex:author ?a }} GROUP BY ?a }}
          ?a ex:name ?n .
        }} ORDER BY ?n
    """).collect()
    assert [(r["n"], r["c"]) for r in out] == [("Ada", 2), ("Grace", 1)]


def test_plain_projection_subquery_restricts(graph):
    out = sparql_select(graph, f"""
        PREFIX ex: <{EX}>
        SELECT DISTINCT ?a WHERE {{
          {{ SELECT ?a WHERE {{ ?d ex:author ?a . ?d ex:size ?s .
                                FILTER (?s > 15) }} }}
        }} ORDER BY ?a
    """).collect()
    assert [r["a"] for r in out] == [EX + "a1", EX + "a2"]


def test_topk_subquery(graph):
    out = sparql_select(graph, f"""
        PREFIX ex: <{EX}>
        SELECT ?d ?n WHERE {{
          {{ SELECT ?d ?a WHERE {{ ?d ex:author ?a . ?d ex:size ?s }}
             ORDER BY DESC(?s) LIMIT 1 }}
          ?a ex:name ?n .
        }}
    """).collect()
    assert [(r["d"], r["n"]) for r in out] == [(EX + "d2", "Ada")]


def test_inner_scope_is_separate(graph):
    # ?s inside the subquery is NOT projected; the outer ?s is independent
    out = sparql_select(graph, f"""
        PREFIX ex: <{EX}>
        SELECT ?a ?s WHERE {{
          {{ SELECT ?a WHERE {{ ?d ex:author ?a . ?d ex:size ?s
                                FILTER (?s > 25) }} }}
          ?s ex:author ?a .
        }} ORDER BY ?s
    """).collect()
    # inner restricts to a1 (d2 size 30); outer ?s rebinds freely to d1, d2
    assert [(r["a"], r["s"]) for r in out] == [
        (EX + "a1", EX + "d1"),
        (EX + "a1", EX + "d2"),
    ]


def test_construct_from_subquery_binding(graph):
    rows = sparql_construct(graph, f"""
        PREFIX ex: <{EX}>
        CONSTRUCT {{ ?a ex:docCount ?c }}
        WHERE {{
          {{ SELECT ?a (COUNT(?d) AS ?c) WHERE {{ ?d ex:author ?a }} GROUP BY ?a }}
        }}
    """).collect()
    got = sorted((r["subj"], r["obj_value"], r["obj_dtype"], r["obj_is_iri"])
                 for r in rows)
    assert got == [
        (EX + "a1", "2", "xsd:integer", False),
        (EX + "a2", "1", "xsd:integer", False),
    ]


def test_having_and_distinct_in_subquery(graph):
    out = sparql_select(graph, f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          {{ SELECT ?a (COUNT(?d) AS ?c) WHERE {{ ?d ex:author ?a }}
             GROUP BY ?a HAVING (?c > 1) }}
          ?a ex:name ?n .
        }}
    """).collect()
    assert [r["n"] for r in out] == ["Ada"]


def test_exists_projection_rejected_in_subquery(graph):
    with pytest.raises(SparqlError):
        sparql_select(graph, f"""
            PREFIX ex: <{EX}>
            SELECT ?a WHERE {{
              {{ SELECT ?a (EXISTS {{ ?a ex:name ?n }} AS ?e)
                 WHERE {{ ?d ex:author ?a }} }}
            }}
        """)


def test_offset_and_sample(graph):
    out = sparql_select(graph, f"""
        PREFIX ex: <{EX}>
        SELECT ?d WHERE {{ ?d ex:size ?s }} ORDER BY DESC(?s) LIMIT 1 OFFSET 1
    """).collect()
    assert [r["d"] for r in out] == [EX + "d3"]  # sizes 30, 20, 10

    out = sparql_select(graph, f"""
        PREFIX ex: <{EX}>
        SELECT ?a (SAMPLE(?d) AS ?pick) WHERE {{ ?d ex:author ?a }}
        GROUP BY ?a ORDER BY ?a
    """).collect()
    assert [(r["a"], r["pick"]) for r in out] == [
        (EX + "a1", EX + "d1"),
        (EX + "a2", EX + "d3"),
    ]


def test_offset_in_subquery(graph):
    out = sparql_select(graph, f"""
        PREFIX ex: <{EX}>
        SELECT ?d WHERE {{
          {{ SELECT ?d WHERE {{ ?d ex:size ?s }}
             ORDER BY DESC(?s) LIMIT 2 OFFSET 1 }}
        }} ORDER BY ?d
    """).collect()
    assert [r["d"] for r in out] == [EX + "d1", EX + "d3"]


def test_describe_var_and_iri(graph):
    from kgforge.sparql import sparql_describe

    out = sparql_describe(graph, f"""
        PREFIX ex: <{EX}>
        DESCRIBE ?a WHERE {{ ?d ex:author ?a . ?d ex:size "30" }}
    """).collect()
    # only a1 authored d2 (size 30) → a1's subject rows
    assert sorted((r["subj"], r["pred"]) for r in out) == [
        (EX + "a1", EX + "name"),
    ]

    out = sparql_describe(graph, f"DESCRIBE <{EX}d1>").collect()
    assert sorted(r["pred"] for r in out) == [EX + "author", EX + "size"]


def test_describe_skips_literal_bindings(graph):
    from kgforge.sparql import sparql_describe

    # ?s is literal-valued ("30" etc.) → nothing described
    out = sparql_describe(graph, f"""
        PREFIX ex: <{EX}>
        DESCRIBE ?s WHERE {{ ?d ex:size ?s }}
    """).collect()
    assert out == []
