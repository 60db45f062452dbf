"""Ontology / taxonomy alignment by shared instances.

When two pipelines type the same entities against different class
vocabularies, the graphs only merge after the classes are aligned.  The
instance-based family of ontology-matching systems (PARIS, Suchanek et
al. VLDB 2012; the extensional matchers in the OAEI campaigns) scores a
class pair by how many instances they share — this module is that core,
kept integer-exact:

    n_common(c_a, c_b) = |inst(c_a) ∩ inst(c_b)|
    jaccard_micro      = n_common · 10⁶ div (n_a + n_b − n_common)

Scale shape: one equi-join on the instance id (the only corpus-sized
shuffle — co-partitioned by instance, skew bounded by per-instance type
counts), then class-pair and class-size aggregations that are map-side
combinable and vocabulary-sized.  No similarity join over class labels
— label similarity is a *fallback* signal, not needed when extension
overlap exists (and the repo's trigram/Jaro operators cover it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def align_classes_by_instances(
    types_a: DataFrame,
    types_b: DataFrame,
    inst_col: str = "inst",
    cls_col: str = "cls",
) -> DataFrame:
    """(cls_a, cls_b, n_common, n_a, n_b, jaccard_micro) for every class
    pair with at least one shared instance.  Inputs are (inst, cls)
    membership tables; duplicate memberships collapse."""
    a = types_a.select(
        F.col(inst_col).alias("inst"), F.col(cls_col).alias("cls_a")
    ).distinct()
    b = types_b.select(
        F.col(inst_col).alias("inst"), F.col(cls_col).alias("cls_b")
    ).distinct()
    na = a.groupBy("cls_a").agg(F.count(F.lit(1)).cast("bigint").alias("n_a"))
    nb = b.groupBy("cls_b").agg(F.count(F.lit(1)).cast("bigint").alias("n_b"))
    inter = (
        a.join(b, "inst")
        .groupBy("cls_a", "cls_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        inter.join(na, "cls_a")
        .join(nb, "cls_b")
        .select(
            "cls_a", "cls_b", "n_common", "n_a", "n_b",
            F.expr(f"(n_common * {MICRO}) div (n_a + n_b - n_common)")
            .cast("bigint")
            .alias("jaccard_micro"),
        )
    )


def best_class_alignment(scores: DataFrame) -> DataFrame:
    """Winner per cls_a: highest Jaccard, then highest overlap, ties to
    the lexicographically smallest cls_b — deterministic under any
    partitioning.  The window partitions by class (vocabulary-bounded)."""
    w = Window.partitionBy("cls_a").orderBy(
        F.desc("jaccard_micro"), F.desc("n_common"), F.asc("cls_b")
    )
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
