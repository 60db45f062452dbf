"""N-Triples serializer/parser: golden lines, round-trips, corrupt-input
policy, and plan hygiene (pure codegen, no Python nodes, no shuffle)."""

import pytest
from pyspark.sql import functions as F

from kgforge.ntriples import from_ntriples, to_ntriples
from kgforge.triples import RDF_TYPE, triples_df

XSD = "http://www.w3.org/2001/XMLSchema#"


def _nasty_rows():
    return [
        ("http://ex.org/a", RDF_TYPE, "http://ex.org/T", "iri", True),
        ("http://ex.org/a", "http://ex.org/name", 'say "hi"\nline2\tend\\', "string", False),
        ("http://ex.org/a", "http://ex.org/bal", "123.45", "xsd:double", False),
        ("http://ex.org/a", "http://ex.org/day", "2024-02-29", "xsd:date", False),
        ("http://ex.org/a", "http://ex.org/n", "42", "xsd:integer", False),
        ("http://ex.org/a", "http://ex.org/ok", "true", "xsd:boolean", False),
        ("_:b0", "http://ex.org/ref", "http://ex.org/a", "iri", True),
        ("http://ex.org/a", "http://ex.org/kid", "_:b0", "iri", True),
        ("http://ex.org/a", "http://ex.org/label", "café 中文", "@en", False),
        ("http://ex.org/a", "http://ex.org/odd", "v", "java:java.time.LocalDate", False),
        ("http://ex.org/a", "http://ex.org/bs", "\\n is not a newline", "string", False),
        ("http://ex.org/a", "http://ex.org/crlf", "a\r\nb", "string", False),
    ]


def test_golden_lines(spark):
    t = triples_df(
        spark,
        [
            ("http://ex.org/a", "http://ex.org/name", 'q"\\\n\t', "string", False),
            ("http://ex.org/a", "http://ex.org/bal", "1.5", "xsd:double", False),
            ("_:b1", RDF_TYPE, "http://ex.org/T", "iri", True),
            ("http://ex.org/a", "http://ex.org/label", "hi", "@en", False),
        ],
    )
    lines = {r["line"] for r in to_ntriples(t).collect()}
    assert lines == {
        '<http://ex.org/a> <http://ex.org/name> "q\\"\\\\\\n\\t" .',
        f'<http://ex.org/a> <http://ex.org/bal> "1.5"^^<{XSD}double> .',
        f"_:b1 <{RDF_TYPE}> <http://ex.org/T> .",
        '<http://ex.org/a> <http://ex.org/label> "hi"@en .',
    }


def test_roundtrip_multiset(spark):
    rows = _nasty_rows()
    t = triples_df(spark, rows)
    back = from_ntriples(to_ntriples(t)).collect()
    assert sorted(map(tuple, back)) == sorted(rows)


def test_parse_hand_written(spark):
    lines = spark.createDataFrame(
        [
            ("# a comment",),
            ("   ",),
            ('<http://e/s> <http://e/p> "plain" .',),
            (f'<http://e/s> <http://e/p2> "7"^^<{XSD}integer> .',),
            (f'<http://e/s> <http://e/p3> "x"^^<{XSD}string> .',),
            ('<http://e/s> <http://e/p4> "bon"@fr-CA .',),
            ("<http://e/s> <http://e/p5> _:bn .",),
            ('  <http://e/s>   <http://e/p6>  <http://e/o>  .  ',),
        ],
        "line string",
    )
    got = {tuple(r) for r in from_ntriples(lines).collect()}
    assert got == {
        ("http://e/s", "http://e/p", "plain", "string", False),
        ("http://e/s", "http://e/p2", "7", "xsd:integer", False),
        ("http://e/s", "http://e/p3", "x", "string", False),
        ("http://e/s", "http://e/p4", "bon", "@fr-CA", False),
        ("http://e/s", "http://e/p5", "_:bn", "iri", True),
        ("http://e/s", "http://e/p6", "http://e/o", "iri", True),
    }


def test_corrupt_line_policy(spark):
    lines = spark.createDataFrame(
        [
            ('<http://e/s> <http://e/p> "ok" .',),
            ("not a triple at all",),
            ('<http://e/s> <http://e/p> "unterminated .',),
        ],
        "line string",
    )
    assert from_ntriples(lines, mode="skip").count() == 1
    with pytest.raises(ValueError, match="unparseable|malformed"):
        from_ntriples(lines, mode="strict").count()


def test_roundtrip_flat_ingest(spark, sf_dir=None):
    """Real-table round-trip: deterministically-minted customer triples
    survive serialize→parse exactly (multiset equality)."""
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    cust = spark.read.parquet(f"{sf}/customer.parquet").limit(200)
    t = cust.select(
        F.concat(F.lit("http://ex.org/c/"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("http://ex.org/acctbal").alias("pred"),
        F.col("c_acctbal").cast("string").alias("obj_value"),
        F.lit("xsd:double").alias("obj_dtype"),
        F.lit(False).alias("obj_is_iri"),
    )
    orig = sorted(map(tuple, t.collect()))
    back = sorted(map(tuple, from_ntriples(to_ntriples(t)).collect()))
    assert back == orig


def test_plan_pure_codegen(spark):
    """Both directions stay JVM-side and shuffle-free: no Python-eval nodes,
    no Exchange — the export writes from the table's existing partitioning."""
    t = triples_df(spark, _nasty_rows())
    for df in (to_ntriples(t), from_ntriples(to_ntriples(t))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan
        assert "Exchange" not in plan
