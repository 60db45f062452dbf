"""Turtle serializer/parser: golden blocks, prefix compaction rules,
round-trips (with and without prefixes), and plan hygiene (one shuffle,
no Python nodes)."""

import pytest
from pyspark.sql import functions as F

from kgforge.ntriples import from_ntriples, to_ntriples
from kgforge.triples import RDF_TYPE, triples_df
from kgforge.turtle import from_turtle, to_turtle

XSD = "http://www.w3.org/2001/XMLSchema#"
PFX = {"ex": "http://ex.org/", "xsd": XSD}


def _rows():
    return [
        ("http://ex.org/a", RDF_TYPE, "http://ex.org/T", "iri", True),
        ("http://ex.org/a", "http://ex.org/name", 'say "hi"\nend\\', "string", False),
        ("http://ex.org/a", "http://ex.org/bal", "123.45", "xsd:double", False),
        ("http://ex.org/a", "http://ex.org/label", "café", "@en", False),
        ("http://ex.org/a", "http://ex.org/kid", "_:b0", "iri", True),
        ("_:b0", "http://ex.org/ref", "http://ex.org/a", "iri", True),
        # local part with '/' — must NOT compact
        ("http://ex.org/c/9", "http://ex.org/n", "7", "xsd:integer", False),
        ("http://ex.org/a", "http://other.org/p", "v", "string", False),
    ]


def test_golden_block(spark):
    t = triples_df(
        spark,
        [
            ("http://ex.org/a", RDF_TYPE, "http://ex.org/T", "iri", True),
            ("http://ex.org/a", "http://ex.org/bal", "1.5", "xsd:double", False),
            ("http://ex.org/a", "http://ex.org/name", 'q"z', "string", False),
        ],
    )
    rows = {r["block"] for r in to_turtle(t, PFX).collect()}
    assert rows == {
        "@prefix ex: <http://ex.org/> .",
        f"@prefix xsd: <{XSD}> .",
        'ex:a a ex:T ;\n    ex:bal "1.5"^^xsd:double ;\n    ex:name "q\\"z" .',
    }


def test_compaction_rules(spark):
    # longest namespace wins; unsafe local parts stay in <...> form
    t = triples_df(
        spark,
        [
            ("http://ex.org/sub/x", "http://ex.org/p", "v", "string", False),
            ("http://ex.org/c/9", "http://ex.org/p", "v", "string", False),
        ],
    )
    pfx = {"ex": "http://ex.org/", "sub": "http://ex.org/sub/"}
    blocks = {r["block"] for r in to_turtle(t, pfx).collect() if not r["block"].startswith("@")}
    assert blocks == {
        'sub:x ex:p "v" .',
        '<http://ex.org/c/9> ex:p "v" .',
    }


def test_roundtrip_with_prefixes(spark):
    t = triples_df(spark, _rows())
    back = from_turtle(to_turtle(t, PFX)).collect()
    assert sorted(map(tuple, back)) == sorted(_rows())


def test_roundtrip_no_prefixes(spark):
    t = triples_df(spark, _rows())
    back = from_turtle(to_turtle(t)).collect()
    assert sorted(map(tuple, back)) == sorted(_rows())


def test_turtle_ntriples_agree(spark):
    """Same graph through both serializers parses back to one multiset."""
    t = triples_df(spark, _rows())
    via_nt = sorted(map(tuple, from_ntriples(to_ntriples(t)).collect()))
    via_ttl = sorted(map(tuple, from_turtle(to_turtle(t, PFX)).collect()))
    assert via_nt == via_ttl


def test_multiline_separator_safe(spark):
    """A literal containing the raw statement-separator text still
    round-trips: the newline is escaped, so the split cannot fire inside."""
    rows = [("http://ex.org/a", "http://ex.org/p", " ;\n    evil", "string", False)]
    t = triples_df(spark, rows)
    back = from_turtle(to_turtle(t, PFX)).collect()
    assert sorted(map(tuple, back)) == sorted(rows)


def test_skip_policy(spark):
    lines = spark.createDataFrame(
        [
            ("@prefix ex: <http://ex.org/> .",),
            ('ex:a ex:p "ok" .',),
            ("# comment",),
            ("   ",),
            ("complete garbage",),
        ],
        "block string",
    )
    got = [tuple(r) for r in from_turtle(lines).collect()]
    assert got == [("http://ex.org/a", "http://ex.org/p", "ok", "string", False)]


def test_plan_hygiene(spark):
    """Serializer: exactly one exchange (the subject groupBy), no Python."""
    t = triples_df(spark, _rows())
    plan = to_turtle(t, PFX)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    assert plan.count("Exchange") <= 2  # partial+final agg exchange pair max
