"""Mondrian multidimensional k-anonymity (rank-split variant).

LeFevre, DeWitt & Ramakrishnan's Mondrian (ICDE 2006) is the standard
multidimensional recoding algorithm: recursively cut the quasi-
identifier space with median splits until no region can be cut without
dropping below k members, then generalize each region to its bounding
ranges.  This implementation makes two standard-preserving choices that
keep the recursion deterministic and distributed:

* **rank splits** — a region of n rows is cut at position ``n div 2``
  of its ``(attribute value, id)`` order, so the halves have exactly
  ``n div 2`` and ``n - n div 2`` members and a cut is allowable iff
  ``n >= 2k`` (value-median splits must re-check the sides; rank splits
  cannot produce an undersized side, and ties are broken by the unique
  id instead of stalling the cut);
* **round-robin attribute choice** — round r cuts attribute
  ``r mod d`` for every region (the paper's widest-normalized-range
  heuristic is one of several it allows; a global schedule keeps every
  region on the same round structure, which is what makes the whole
  recursion ONE window per round instead of per-region planning).

Scale shape: every round is one window pass partitioned by the region
id (regions only shrink, so per-task memory is bounded by the largest
CURRENT region) plus one size aggregate for the stop test; rounds are
O(log2(n/k)).  No collects beyond one max-size scalar per round, no
pair sets, no per-region driver loops — a billion rows with k=100 is
~23 rounds of bounded shuffles.

Output group labels are canonicalized to the minimum member id, so the
labeling is a pure function of the data (independent of how many no-op
rounds an engine runs) — which is also what makes the DuckDB oracle's
fixed-depth unrolling comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mondrian_anonymize(
    df: DataFrame,
    qi_cols: list[str],
    k: int,
    id_col: str,
    max_rounds: int = 48,
) -> DataFrame:
    """k-anonymous multidimensional recoding of ``qi_cols``.

    Returns one row per input row: ``id_col``, each quasi-identifier's
    original value, ``group`` (minimum member id of the row's region),
    ``group_n`` (region size, always >= k when the input has >= k
    rows), and per-attribute generalization bounds ``<attr>_lo`` /
    ``<attr>_hi`` — the published form replaces each value with its
    region's range.  Quasi-identifiers must be orderable and non-null;
    ``id_col`` must be unique (it tie-breaks every cut)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    d = len(qi_cols)
    cur = df.select(
        id_col, *qi_cols, F.lit(0).cast("bigint").alias("_pid")
    ).localCheckpoint(eager=True)

    for r in range(max_rounds):
        mx = cur.groupBy("_pid").count().agg(F.max("count")).collect()[0][0]
        if mx is None or mx < 2 * k:
            break
        attr = qi_cols[r % d]
        w = Window.partitionBy("_pid").orderBy(F.col(attr), F.col(id_col))
        part = Window.partitionBy("_pid")
        rn = F.row_number().over(w).cast("bigint")
        n = F.count(F.lit(1)).over(part).cast("bigint")
        side = F.when(
            (n >= 2 * k) & (rn > F.floor(n / 2)), F.lit(1)
        ).otherwise(F.lit(0))
        cur = cur.select(
            id_col,
            *qi_cols,
            (F.col("_pid") * 2 + side).alias("_pid"),
        ).localCheckpoint(eager=True)
    else:
        raise ValueError(f"did not converge in {max_rounds} rounds")

    gw = Window.partitionBy("_pid")
    bounds = []
    for a in qi_cols:
        bounds.append(F.min(a).over(gw).alias(f"{a}_lo"))
        bounds.append(F.max(a).over(gw).alias(f"{a}_hi"))
    return cur.select(
        id_col,
        *qi_cols,
        F.min(id_col).over(gw).alias("group"),
        F.count(F.lit(1)).over(gw).cast("bigint").alias("group_n"),
        *bounds,
    )


def mondrian_ncp(
    anonymized: DataFrame,
    qi_cols: list[str],
) -> DataFrame:
    """Information loss of a :func:`mondrian_anonymize` result as the
    normalized certainty penalty (Xu et al. 2006): ``NCP = (1/(d·n)) ·
    Σ_rows Σ_attr (hi_a − lo_a)/(gmax_a − gmin_a)`` — 0 when nothing was
    generalized, 1 when every region spans the whole attribute range.
    The utility metric every k-anonymity paper reports next to k.

    One aggregate job: per-attribute interval sums and global ranges are
    exact int64; the division is the single final float expression
    (rounded 6).  Constant attributes (gmax = gmin) contribute 0."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for a in qi_cols:
        aggs.append(
            F.sum(F.col(f"{a}_hi") - F.col(f"{a}_lo")).alias(f"_span_{a}")
        )
        aggs.append(F.min(a).alias(f"_lo_{a}"))
        aggs.append(F.max(a).alias(f"_hi_{a}"))
    m = anonymized.agg(*aggs)
    d = len(qi_cols)
    ncp = F.lit(0.0)
    for a in qi_cols:
        rng = (F.col(f"_hi_{a}") - F.col(f"_lo_{a}")).cast("double")
        term = F.when(
            rng > 0, F.col(f"_span_{a}").cast("double") / rng
        ).otherwise(F.lit(0.0))
        ncp = ncp + term
    return m.select(
        "n",
        F.round(ncp / (F.lit(d) * F.col("n").cast("double")), 6).alias("ncp"),
    )
