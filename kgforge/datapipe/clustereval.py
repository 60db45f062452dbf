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


def blocking_eval(
    records: DataFrame, label_col: str, block_col: str
) -> DataFrame:
    """Blocking-quality metrics for entity resolution (Christen 2012):
    given records with a TRUE entity label and a candidate blocking key,
    score the blocker without ever materializing a pair set — every pair
    count comes from the contingency identity Σ C(n, 2):

        reduction_ratio     = 1 − candidate_pairs / total_pairs
        pairs_completeness  = covered_true_pairs / true_pairs   (recall)
        pair_quality        = covered_true_pairs / candidate_pairs
        f1                  = harmonic mean of completeness and quality

    A true pair is covered iff both records share a block (single-valued
    blocking keys), so covered = Σ_{(block,label)} C(n_bl, 2).

    Output: one row — ``(n_records, n_blocks, total_pairs,
    candidate_pairs, true_pairs, covered_pairs, reduction_ratio,
    pairs_completeness, pair_quality, f1)``; ratio columns NULL when
    their denominator is 0.

    Scale: ONE groupBy on (block, label), re-aggregated three ways (per
    block, per label, global) — map-side combinable, no joins, no pair
    materialization; the same identity trick as ``cluster_pairwise_eval``.
    """
    bl = records.select(
        F.col(block_col).alias("_b"), F.col(label_col).alias("_l")
    ).groupBy("_b", "_l").agg(F.count(F.lit(1)).cast("bigint").alias("_n"))

    covered = bl.agg(
        F.shiftright(F.sum(_pairs2(F.col("_n"))).cast("bigint"), 1)
        .alias("covered_pairs"),
        F.sum("_n").cast("bigint").alias("n_records"),
    )
    cand = (
        bl.groupBy("_b")
        .agg(F.sum("_n").alias("_nb"))
        .agg(
            F.shiftright(F.sum(_pairs2(F.col("_nb"))).cast("bigint"), 1)
            .alias("candidate_pairs"),
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        )
    )
    true_p = (
        bl.groupBy("_l")
        .agg(F.sum("_n").alias("_nl"))
        .agg(
            F.shiftright(F.sum(_pairs2(F.col("_nl"))).cast("bigint"), 1)
            .alias("true_pairs")
        )
    )
    j = covered.crossJoin(F.broadcast(cand)).crossJoin(F.broadcast(true_p))
    total = F.shiftright(_pairs2(F.col("n_records")).cast("bigint"), 1)
    pc = F.col("covered_pairs").cast("double") / F.col("true_pairs")
    pq = F.col("covered_pairs").cast("double") / F.col("candidate_pairs")
    return j.select(
        "n_records",
        "n_blocks",
        total.alias("total_pairs"),
        "candidate_pairs",
        "true_pairs",
        "covered_pairs",
        F.when(
            total > 0,
            F.round(
                F.lit(1.0) - F.col("candidate_pairs").cast("double") / total, 6
            ),
        ).alias("reduction_ratio"),
        F.when(F.col("true_pairs") > 0, F.round(pc, 6)).alias(
            "pairs_completeness"
        ),
        F.when(F.col("candidate_pairs") > 0, F.round(pq, 6)).alias(
            "pair_quality"
        ),
        F.when(
            (F.col("true_pairs") > 0)
            & (F.col("candidate_pairs") > 0)
            & (pc + pq > 0),
            F.round(2 * pc * pq / (pc + pq), 6),
        ).alias("f1"),
    )


def bcubed_eval(
    assignments: DataFrame,
    id_col: str,
    cluster_col: str,
    truth_col: str,
) -> DataFrame:
    """B-cubed clustering evaluation (Bagga & Baldwin 1998; the
    standard ER-clustering metric alongside pairwise F — less sensitive
    to one giant cluster dominating the pair counts).

    Per item i with predicted cluster C and truth class T:
    precision_i = o(C,T)/|C|, recall_i = o(C,T)/|T| where o is the
    overlap count; B³ P/R are the means over items.  Using the identity
    Σ_i prec_i = Σ_{C,T} o(C,T)²/|C|, the whole metric is three
    map-side-combinable aggregations over (cluster, truth) contingency
    cells — no per-item pass, no pair explosion.

    Fixed-point discipline: each cell contributes
    ``o²·10⁶ div n`` (integer), the mean divides by N once more, and
    F1 = 2PR div (P+R) — every step integer, engine-exact (the two
    nested truncations are part of the metric's contract here and the
    oracle reproduces them verbatim).

    Output: one row (n_items, prec_ppm, rec_ppm, f1_ppm).
    """
    a = assignments.select(
        F.col(id_col).alias("id"),
        F.col(cluster_col).alias("c"),
        F.col(truth_col).alias("t"),
    ).distinct()
    cells = a.groupBy("c", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("o"))
    nc = a.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("n_c"))
    nt = a.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))
    j = cells.join(nc, "c").join(nt, "t")
    sums = j.agg(
        F.sum(F.expr("(o * o * 1000000) div n_c")).cast("bigint").alias("_p"),
        F.sum(F.expr("(o * o * 1000000) div n_t")).cast("bigint").alias("_r"),
        F.sum("o").cast("bigint").alias("n_items"),
    )
    return sums.select(
        "n_items",
        F.expr("_p div n_items").cast("bigint").alias("prec_ppm"),
        F.expr("_r div n_items").cast("bigint").alias("rec_ppm"),
        F.expr(
            "CASE WHEN (_p div n_items) + (_r div n_items) > 0 "
            "THEN (2 * (_p div n_items) * (_r div n_items))"
            " div ((_p div n_items) + (_r div n_items)) END"
        ).cast("bigint").alias("f1_ppm"),
    )
