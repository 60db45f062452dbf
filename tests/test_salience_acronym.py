"""Unit mirrors for acronym/initialism linking (kg/linking.py) and
entity-mention salience (kg/salience.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.kg.linking import acronym_links, entity_initials
from kgforge.kg.salience import MICRO, entity_salience_rollup, mention_salience


def test_entity_initials(spark):
    df = spark.createDataFrame(
        [("International Business Machines",), ("Acme  Corporation",),
         ("lowercase name here",)],
        "canonical string",
    )
    got = [r["i"] for r in
           df.select(entity_initials(F.col("canonical")).alias("i")).collect()]
    # double space produces no empty-word initial; lowercase gets uppercased
    assert got == ["IBM", "AC", "LNH"]


def test_acronym_links_blocking_and_filtering(spark):
    mentions = spark.createDataFrame(
        [(1, "IBM", 10), (1, "ibm", 20), (2, "ACB", 0), (2, "A", 5),
         (3, "Acme Corp", 7), (3, "BDL", 3), (4, "IBM2", 1), (5, "GUT", 2)],
        "doc_id int, surface string, start int",
    )
    catalog = spark.createDataFrame(
        [("o1", "International Business Machines"),
         ("o2", "Austrian Central Bank"),
         ("o3", "Big Data Lab"),
         ("o4", "Big Dune Lodge"),          # ambiguous with o3
         ("o5", "Graz University Tech")],
        "eid string, canonical string",
    )
    got = sorted(
        (r["doc_id"], r["surface"], r["eid"])
        for r in acronym_links(mentions, catalog).collect()
    )
    # lowercase, single-letter, multi-word, and digit-bearing surfaces drop;
    # BDL is ambiguous → one row per candidate
    assert got == [
        (1, "IBM", "o1"),
        (2, "ACB", "o2"),
        (3, "BDL", "o3"),
        (3, "BDL", "o4"),
        (5, "GUT", "o5"),
    ]


def test_acronym_links_plan_broadcasts_catalog(spark):
    mentions = spark.createDataFrame(
        [(1, "IBM", 10)], "doc_id int, surface string, start int")
    catalog = spark.createDataFrame(
        [("o1", "International Business Machines")], "eid string, canonical string")
    plan = (
        acronym_links(mentions, catalog)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_mention_salience_integer_formula(spark):
    mentions = spark.createDataFrame(
        [(1, "acme", 0), (1, "acme", 50), (1, "vienna", 90), (2, "acme", 99)],
        "doc_id int, surface string, start int",
    )
    lengths = spark.createDataFrame(
        [(1, 100), (2, 100)], "doc_id int, doc_len int")
    got = {
        (r["doc_id"], r["surface"]): (
            r["n_mentions"], r["first_start"], r["salience_micro"])
        for r in mention_salience(mentions, lengths).collect()
    }
    # acme@doc1: 2 mentions, first at 0 → 2_000_000 + 1_000_000
    assert got[(1, "acme")] == (2, 0, 3 * MICRO)
    # vienna@doc1: 1 mention at 90 → 1_000_000 + (10 * MICRO) div 100
    assert got[(1, "vienna")] == (1, 90, MICRO + (10 * MICRO) // 100)
    # acme@doc2: mention at 99 → 1_000_000 + 10_000
    assert got[(2, "acme")] == (1, 99, MICRO + (1 * MICRO) // 100)


def test_entity_salience_rollup(spark):
    mentions = spark.createDataFrame(
        [(1, "acme", 0), (1, "acme", 50), (2, "acme", 99), (2, "graz", 10)],
        "doc_id int, surface string, start int",
    )
    lengths = spark.createDataFrame(
        [(1, 100), (2, 200)], "doc_id int, doc_len int")
    per_doc = mention_salience(mentions, lengths)
    got = {
        r["surface"]: (r["n_docs"], r["total_mentions"],
                       r["total_salience_micro"], r["mean_first_permille"])
        for r in entity_salience_rollup(per_doc).collect()
    }
    acme_doc1 = 2 * MICRO + MICRO  # first at 0
    acme_doc2 = MICRO + (101 * MICRO) // 200
    # mean first permille: doc1 0‰, doc2 (99*1000)//200 = 495‰ → (0+495)//2
    assert got["acme"] == (2, 3, acme_doc1 + acme_doc2, (0 + 495) // 2)
    graz = MICRO + (190 * MICRO) // 200
    assert got["graz"] == (1, 1, graz, (10 * 1000) // 200)


def test_salience_plan_is_jvm_only(spark):
    mentions = spark.createDataFrame(
        [(1, "acme", 0)], "doc_id int, surface string, start int")
    lengths = spark.createDataFrame([(1, 100)], "doc_id int, doc_len int")
    per_doc = mention_salience(mentions, lengths)
    plan = (entity_salience_rollup(per_doc)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
