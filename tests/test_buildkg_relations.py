"""build_kg(relation_patterns=...) integration: relation mining as an
optional flagship-pipeline stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.kg.pipeline import build_kg
from kgforge.kg.relations import DEFAULT_RELATION_PATTERNS


def _docs(spark):
    rows = [
        (
            "d1",
            [("text", "Acme Corporation opened. Beta LLC acquired Acme Corp today.",
              "", 0)],
        ),
        (
            "d2",
            [("text", "Jane Roe, CEO of Beta LLC, spoke in Vienna.", "", 0),
             ("image", "", "img://1", 1)],
        ),
        ("d3", [("text", "nothing relational here about vienna", "", 0)]),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_build_kg_without_patterns_emits_no_relation_triples(spark):
    triples, metrics = build_kg(_docs(spark), collect_metrics=False)
    assert triples.filter(F.col("pred").contains("rel/")).count() == 0
    assert "n_relation_triples" not in metrics


def test_build_kg_with_patterns_adds_supported_relations(spark):
    base, _ = build_kg(_docs(spark), collect_metrics=False)
    triples, metrics = build_kg(
        _docs(spark), relation_patterns=DEFAULT_RELATION_PATTERNS)
    rel = triples.filter(F.col("pred").contains("rel/")).collect()
    got = {(r["subj"], r["pred"], r["obj_value"]) for r in rel}
    assert any("Beta%20LLC" in s and p.endswith("rel/acquired")
               and "Acme%20Corp" in o for s, p, o in got)
    assert any("Jane%20Roe" in s and p.endswith("rel/ceo_of") for s, p, _o in got)
    assert metrics["n_relation_triples"] == len(got) == len(rel)
    # every relation triple is IRI-typed and the base graph is unchanged
    assert all(r["obj_is_iri"] and r["obj_dtype"] == "iri" for r in rel)
    n_base = base.count()
    assert triples.count() == n_base + len(rel)
