"""Unit tests for R2RML-lite table→triples mapping (kg/r2rml.py) and
context-coherence disambiguation (kg/disambig.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.kg.disambig import coherence_disambiguate
from kgforge.kg.r2rml import ObjectMap, TriplesMap, r2rml_graph, r2rml_triples
from kgforge.triples import RDF_TYPE


def _cust_map():
    return TriplesMap(
        subject_template="http://ex/cust/{ck}",
        rdf_class="http://ex/Customer",
        object_maps=(
            ObjectMap("http://ex/name", column="name"),
            ObjectMap("http://ex/nation", template="http://ex/nation/{nk}"),
            ObjectMap("http://ex/source", constant="http://ex/src/tpch"),
        ),
    )


def test_r2rml_row_expansion_and_null_rules(spark):
    df = spark.createDataFrame(
        [(1, "alice", 10), (2, None, 20), (3, "carol", None), (None, "dee", 40)],
        "ck int, name string, nk int",
    )
    got = {(r["subj"], r["pred"], r["obj_value"], r["obj_dtype"], r["obj_is_iri"])
           for r in r2rml_triples(df, _cust_map()).collect()}
    # row 1: all four triples
    assert ("http://ex/cust/1", RDF_TYPE, "http://ex/Customer", "iri", True) in got
    assert ("http://ex/cust/1", "http://ex/name", "alice", "string", False) in got
    assert ("http://ex/cust/1", "http://ex/nation", "http://ex/nation/10",
            "iri", True) in got
    assert ("http://ex/cust/1", "http://ex/source", "http://ex/src/tpch",
            "iri", True) in got
    # NULL name drops only the name triple; NULL nk drops only the ref
    assert not any(s == "http://ex/cust/2" and p == "http://ex/name"
                   for s, p, *_ in got)
    assert any(s == "http://ex/cust/2" and p == "http://ex/nation"
               for s, p, *_ in got)
    assert not any(s == "http://ex/cust/3" and p == "http://ex/nation"
                   for s, p, *_ in got)
    # NULL subject-template column drops the whole row
    assert not any("dee" in (v or "") for *_x, v in
                   [(s, p, v) for s, p, v, _d, _i in got])
    assert len([1 for s, *_ in got if s == "http://ex/cust/1"]) == 4


def test_r2rml_graph_union_and_plan_has_no_exchange(spark):
    cust = spark.createDataFrame([(1, "alice", 10)], "ck int, name string, nk int")
    orders = spark.createDataFrame([(7, 1, "HIGH")], "ok int, ck int, prio string")
    om = TriplesMap(
        subject_template="http://ex/order/{ok}",
        rdf_class="http://ex/Order",
        object_maps=(
            ObjectMap("http://ex/customer", template="http://ex/cust/{ck}"),
            ObjectMap("http://ex/priority", column="prio"),
        ),
    )
    g = r2rml_graph([(cust, _cust_map()), (orders, om)])
    rows = g.collect()
    assert {r["subj"] for r in rows} == {"http://ex/cust/1", "http://ex/order/7"}
    # FK template links the order to the customer's subject IRI
    assert any(r["pred"] == "http://ex/customer"
               and r["obj_value"] == "http://ex/cust/1" for r in rows)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # map-only: zero shuffles
    assert "BatchEvalPython" not in plan


def test_r2rml_object_map_validation():
    with pytest.raises(ValueError, match="exactly one"):
        ObjectMap("p", column="c", template="t{c}")
    with pytest.raises(ValueError, match="exactly one"):
        ObjectMap("p")


# ------------------------------------------------------- disambiguation

_ALIASES = [
    ("paris", "e_par_fr"), ("paris", "e_par_tx"),
    ("france", "e_fr"), ("texas", "e_tx"), ("berlin", "e_ber"),
]
_KB = [("e_par_fr", "e_fr", 5), ("e_par_fr", "e_ber", 1),
       ("e_par_tx", "e_tx", 7)]


def test_coherence_disambiguation_picks_context_coherent_entity(spark):
    mentions = spark.createDataFrame(
        [(1, "paris"), (1, "france"),
         (2, "paris"), (2, "texas"),
         (3, "paris"), (3, "france"), (3, "texas"),
         (4, "paris"),                       # no anchors → zero scores
         (5, "paris"), (5, "berlin"), (5, "paris")],  # dup mention collapses
        "doc_id int, surface string",
    )
    aliases = spark.createDataFrame(_ALIASES, "surface string, eid string")
    kb = spark.createDataFrame(_KB, "a string, b string, w int")
    got = {(r["doc_id"], r["surface"]): (r["eid"], r["score"])
           for r in coherence_disambiguate(mentions, aliases, kb).collect()}
    assert got[(1, "paris")] == ("e_par_fr", 5)
    assert got[(2, "paris")] == ("e_par_tx", 7)
    # both anchors present: tx relatedness (7) beats fr (5)
    assert got[(3, "paris")] == ("e_par_tx", 7)
    # no context: zero scores, smallest eid wins deterministically
    assert got[(4, "paris")] == ("e_par_fr", 0)
    # berlin anchor relates to fr-candidate via the symmetrized edge
    assert got[(5, "paris")] == ("e_par_fr", 1)
    assert len(got) == 5


def test_coherence_disambiguation_plan_broadcasts_dictionaries(spark):
    mentions = spark.createDataFrame([(1, "paris")], "doc_id int, surface string")
    aliases = spark.createDataFrame(_ALIASES, "surface string, eid string")
    kb = spark.createDataFrame(_KB, "a string, b string, w int")
    plan = (coherence_disambiguate(mentions, aliases, kb)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
