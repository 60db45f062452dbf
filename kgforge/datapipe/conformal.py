"""Split-conformal prediction intervals, integer-exact.

Split conformal (Papadopoulos et al. 2002; Vovk's inductive conformal;
the finite-sample coverage result popularized by Lei et al. 2018) is
the distribution-free way to attach a guaranteed-coverage interval to
ANY point predictor: on a calibration split, take the
⌈(n+1)(1−α)⌉-th smallest absolute residual as the radius q̂; then
[ŷ − q̂, ŷ + q̂] covers a fresh point with probability ≥ 1−α.

Implementation discipline: the predictor here is the per-group
calibration mean in micro-units (``sum·10⁶ div n`` — integer), residuals
are integer micro-units, and q̂ is an EXACT order statistic via
row_number (no approx percentile) — so radius and coverage counts are
bit-deterministic and mirror verbatim in SQL.

Scale shape: one combinable aggregate for the group means (broadcast
back — group cardinality, not corpus), one window per group cut at the
quantile rank for q̂, one combinable coverage count.  The per-group
windows are bounded by calibration-split group sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def split_conformal_eval(
    calib: DataFrame,
    test: DataFrame,
    group_col: str,
    y_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Per group: (group, n_calib, pred_micro, qhat_micro, n_test,
    n_covered) at miscoverage α = alpha_num/alpha_den (kept as a
    rational so the quantile rank ⌈(n+1)(1−α)⌉ is exact integer
    arithmetic: ``(n+1)·(den−num) ceildiv den``).

    Groups present only in ``test`` are dropped (no calibration data —
    no guarantee to report)."""
    if not (0 < alpha_num < alpha_den):
        raise ValueError("alpha must be in (0, 1) as alpha_num/alpha_den")
    stats = calib.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_calib"),
        F.sum(F.col(y_col).cast("bigint")).cast("bigint").alias("_sum"),
    ).select(
        group_col, "n_calib",
        F.expr(f"(_sum * {MICRO}) div n_calib").cast("bigint")
        .alias("pred_micro"),
    )
    resid = (
        calib.join(stats, group_col)
        .select(
            group_col, "n_calib", "pred_micro",
            F.abs(F.col(y_col).cast("bigint") * MICRO - F.col("pred_micro"))
            .cast("bigint").alias("_res"),
        )
    )
    # exact rank: ceil((n+1)(den-num)/den), clamped to n
    rank_expr = (
        f"least(((n_calib + 1) * {alpha_den - alpha_num} + {alpha_den - 1})"
        f" div {alpha_den}, n_calib)"
    )
    w = Window.partitionBy(group_col).orderBy("_res")
    qhat = (
        resid.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == F.expr(rank_expr))
        .select(group_col, "n_calib", "pred_micro",
                F.col("_res").alias("qhat_micro"))
    )
    cover = (
        test.join(qhat, group_col)
        .groupBy(group_col, "n_calib", "pred_micro", "qhat_micro")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col(y_col).cast("bigint") * MICRO
                          - F.col("pred_micro")) <= F.col("qhat_micro"),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_covered"),
        )
    )
    return cover
