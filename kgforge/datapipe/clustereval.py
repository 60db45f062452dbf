"""Pairwise evaluation of a clustering against labeled truth.

Dedup and entity-resolution output is judged by PAIRWISE precision /
recall / F1: of all record pairs the system put together, how many
belong together, and how many true pairs did it find.  Materializing
pairs is quadratic; the standard contingency identity avoids it —

    TP          = Σ_cells C(n_ij, 2)     (cell = pred-cluster × true-cluster)
    pred_pairs  = Σ_pred  C(n_i·, 2)
    true_pairs  = Σ_true  C(n_·j, 2)

so the whole evaluation is three map-side-combinable aggregates over
the id-joined label table, integer-exact, with P/R/F1 as the single
final float expression (rounded 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs2(n):
    # 2·C(n,2) = n(n-1): summed as exact int64, halved ONCE at the end
    # (the sum of even numbers stays even)
    return n.cast("long") * (n.cast("long") - F.lit(1))


def _half(col):
    return F.expr(f"CAST({col} div 2 AS BIGINT)")


def cluster_pairwise_eval(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str,
    pred_col: str = "cluster",
    truth_col: str = "label",
) -> DataFrame:
    """One row: ``(n_items, tp, pred_pairs, true_pairs, precision,
    recall, f1)`` for ``pred(id, cluster)`` against
    ``truth(id, label)``.

    Ids present on only one side are dropped (inner join) — evaluate
    coverage separately.  Degenerate cases: no predicted pairs →
    precision null; no true pairs → recall null; f1 null unless both
    are defined and their sum is nonzero."""
    j = pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_p")).join(
        truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_t")),
        "_id",
    )
    cells = j.groupBy("_p", "_t").agg(F.count(F.lit(1)).alias("_n"))
    stats = cells.agg(
        F.sum("_n").cast("bigint").alias("n_items"),
        F.sum(_pairs2(F.col("_n"))).alias("_tp2"),
    ).select("n_items", _half("_tp2").alias("tp"))
    pp = (
        cells.groupBy("_p")
        .agg(F.sum("_n").alias("_np"))
        .agg(F.sum(_pairs2(F.col("_np"))).alias("_pp2"))
        .select(_half("_pp2").alias("pred_pairs"))
    )
    tp_ = (
        cells.groupBy("_t")
        .agg(F.sum("_n").alias("_nt"))
        .agg(F.sum(_pairs2(F.col("_nt"))).alias("_tp2"))
        .select(_half("_tp2").alias("true_pairs"))
    )
    m = stats.crossJoin(F.broadcast(pp)).crossJoin(F.broadcast(tp_))
    prec = F.when(
        F.col("pred_pairs") > 0,
        F.col("tp").cast("double") / F.col("pred_pairs").cast("double"),
    )
    rec = F.when(
        F.col("true_pairs") > 0,
        F.col("tp").cast("double") / F.col("true_pairs").cast("double"),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
        2 * prec * rec / (prec + rec),
    )
    return m.select(
        "n_items",
        "tp",
        "pred_pairs",
        "true_pairs",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
