"""Entity relatedness from co-mention statistics: pointwise mutual
information.

Raw co-mention counts (``kg_cooccurrence``) over-weight globally frequent
entities; the standard fix is PMI (Church & Hanks 1990) over document
co-occurrence — exactly the relatedness signal collective entity linking
consumes (this module's output is the natural ``kb_edges`` input for
``kg/disambig.py``).

    pmi(a, b) = ln( N · c_ab / (c_a · c_b) )

with document-level distinct counts.  Discipline: the single ``ln`` per
pair is frozen to micro-units (the round-6 family), every count is an
exact distinct-doc integer, and the corpus size N rides a broadcast
one-row aggregate — no driver collect.

Scale shape: one distinct projection, one per-entity combinable count,
one within-doc self-join for pairs (bounded by per-doc mention counts —
the same shape the co-occurrence graph already uses, hub-capped
upstream by mention detection), one combinable pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def comention_pmi(
    mentions: DataFrame,
    doc_col: str = "doc_id",
    ent_col: str = "surface",
    min_pairs: int = 1,
) -> DataFrame:
    """(a, b, c_a, c_b, c_ab, pmi_micro) for unordered entity pairs
    co-mentioned in ≥ ``min_pairs`` documents (a < b)."""
    d = mentions.select(
        F.col(doc_col).alias("doc"), F.col(ent_col).alias("ent")
    ).distinct()
    n_docs = d.select("doc").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    counts = d.groupBy("ent").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    left = d.select("doc", F.col("ent").alias("a"))
    right = d.select("doc", F.col("ent").alias("b"))
    pairs = (
        left.join(right, "doc")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= min_pairs)
    )
    ca = counts.select(F.col("ent").alias("a"), F.col("c").alias("c_a"))
    cb = counts.select(F.col("ent").alias("b"), F.col("c").alias("c_b"))
    return (
        pairs.join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "a", "b", "c_a", "c_b", "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") * F.col("n_docs")).cast("double")
                    / (F.col("c_a") * F.col("c_b")).cast("double")
                )
                * MICRO
            )
            .cast("bigint")
            .alias("pmi_micro"),
        )
    )
