"""Context-coherence entity disambiguation (collective linking, lite).

String similarity cannot split "paris" between Paris-France and
Paris-Texas — public entity-linking systems break the tie with document
context coherence: score each candidate by how strongly it relates, in
the existing knowledge graph, to the *unambiguous* entities mentioned in
the same document (the local flavor of Cucerzan 2007 / Milne & Witten
2008 relatedness, and the pairwise term of AIDA, Hoffart et al. 2011).

Inputs are three DataFrames:

- ``mentions`` (doc_id, surface) — detected mention stream;
- ``aliases`` (surface, eid) — the candidate dictionary; surfaces with
  exactly one candidate are the unambiguous anchors, surfaces with more
  are what we disambiguate;
- ``kb_edges`` (a, b, w) — relatedness weights from the existing graph
  (co-mention counts, PPR scores, … any non-negative integer weight);
  treated as undirected (both orientations are scored).

score(doc, surface, eid) = Σ_{ctx ∈ context(doc), ctx ≠ eid} w(eid, ctx),
winner per (doc, surface) = argmax score, ties to the smallest eid;
zero-score candidates stay in the ranking (a doc with no anchors still
resolves deterministically).

Scale shape: the alias dictionary and KB edge table are
vocabulary-sized → broadcast; the only corpus-sized operations are the
mention-stream joins and one combinable aggregation.  The argmax window
partitions by (doc, surface) — groups bounded by the candidate count.
Integer weights keep every score engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coherence_disambiguate(
    mentions: DataFrame,
    aliases: DataFrame,
    kb_edges: DataFrame,
) -> DataFrame:
    """→ (doc_id, surface, eid, score) — one row per ambiguous mention
    surface per doc, the chosen candidate with its coherence score."""
    mdist = mentions.select("doc_id", "surface").distinct()
    n_cands = aliases.groupBy("surface").agg(
        F.count(F.lit(1)).alias("_n"))
    unamb = aliases.join(
        n_cands.filter(F.col("_n") == 1).select("surface"), "surface")
    amb = aliases.join(
        n_cands.filter(F.col("_n") > 1).select("surface"), "surface")

    context = (
        mdist.join(F.broadcast(unamb), "surface")
        .select("doc_id", F.col("eid").alias("ctx"))
        .distinct()
    )
    cands = mdist.join(F.broadcast(amb), "surface")

    # symmetrize then dedup: if the caller's table already stores both
    # orientations (common for undirected relatedness exports, e.g.
    # symmetrized comention_pmi output) or has duplicate rows, the naive
    # union would double every coherence score and could flip ties —
    # keep one weight per ordered pair (max, deterministic)
    sym = (
        kb_edges.select("a", "b", "w")
        .unionByName(kb_edges.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .groupBy("a", "b")
        .agg(F.max("w").alias("w"))
    )
    scored = (
        cands.join(context, "doc_id")
        .filter(F.col("ctx") != F.col("eid"))
        .join(F.broadcast(sym),
              (F.col("eid") == F.col("a")) & (F.col("ctx") == F.col("b")))
        .groupBy("doc_id", "surface", "eid")
        .agg(F.sum("w").cast("bigint").alias("score"))
    )
    full = (
        cands.join(scored, ["doc_id", "surface", "eid"], "left")
        .select(
            "doc_id", "surface", "eid",
            F.coalesce("score", F.lit(0)).cast("bigint").alias("score"),
        )
    )
    win = Window.partitionBy("doc_id", "surface").orderBy(
        F.desc("score"), F.asc("eid"))
    return (
        full.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
