"""Ranking-quality evaluation: NDCG@k, integer-exact.

NDCG (Järvelin & Kekäläinen 2002) is the standard graded-relevance
ranking metric.  The usual float pitfall — ``1/log2(rank+1)`` discount
sums depending on summation order — is avoided by freezing the k
discount weights to micro-unit integers ONCE in the driver
(``wt[r] = round(10⁶ / log2(r+1))``, r = 1..k, inlined as literals), so
DCG and ideal DCG are plain integer dot products and

    ndcg_ppm = dcg · 10⁶ div idcg

is bit-deterministic under any partitioning and engine (the repo's
fixed-point discipline).

Scale shape: two bounded windows per group (rank by score, rank by
relevance — both cut at k via WindowGroupLimit, partially map-side) and
one combinable aggregation.  Groups are query-sized, never global.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _discount_weights(k: int) -> list[int]:
    return [round(MICRO / math.log2(r + 1)) for r in range(1, k + 1)]


def ndcg_at_k(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per group: (group, dcg_micro, idcg_micro, ndcg_ppm) — the ranking
    induced by ``score_col`` (ties broken by ``id_col`` ascending)
    evaluated against integer relevance ``rel_col``; the ideal ranking
    sorts by relevance (same tie-break).  Groups whose ideal DCG is 0
    (no relevant items) report ndcg_ppm = NULL."""
    if k < 1:
        raise ValueError("k must be >= 1")
    wts = _discount_weights(k)
    wt_expr = "CASE _r " + " ".join(
        f"WHEN {r + 1} THEN {w}L" for r, w in enumerate(wts)
    ) + " END"

    by_score = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col))
    by_rel = Window.partitionBy(group_col).orderBy(
        F.desc(rel_col), F.asc(id_col))

    dcg = (
        df.withColumn("_r", F.row_number().over(by_score))
        .filter(F.col("_r") <= k)
        .groupBy(group_col)
        .agg(F.sum(F.col(rel_col).cast("bigint") * F.expr(wt_expr))
             .cast("bigint").alias("dcg_micro"))
    )
    idcg = (
        df.withColumn("_r", F.row_number().over(by_rel))
        .filter(F.col("_r") <= k)
        .groupBy(group_col)
        .agg(F.sum(F.col(rel_col).cast("bigint") * F.expr(wt_expr))
             .cast("bigint").alias("idcg_micro"))
    )
    return dcg.join(idcg, group_col).select(
        group_col,
        "dcg_micro",
        "idcg_micro",
        F.when(F.col("idcg_micro") > 0,
               F.expr(f"(dcg_micro * {MICRO}) div idcg_micro"))
        .cast("bigint")
        .alias("ndcg_ppm"),
    )
