"""HyperBall: the neighborhood function N(t) and effective diameter of a
massive graph by iterated HyperLogLog merging (Boldi & Vigna, "In-Core
Computation of Geometric Centralities with HyperBall", 2013 — the
public method behind the Facebook "four degrees of separation"
measurement).

Each node keeps an HLL sketch of the set of nodes within distance t;
one synchronized round replaces every sketch with the register-wise max
of itself and its neighbors' sketches — exactly a (node, bucket) →
max(rho) aggregation, which is why the method scales: a round is ONE
join + ONE map-side-combinable max-groupBy, registers are sparse (a
node materializes only buckets its ball has hit, so round t costs
O(Σ_v min(|ball_t(v)|, m)) rows, never n·m), and no BFS frontier or
pair set ever exists.  N(t) = Σ_v est(ball_t(v)); the effective
diameter is the first t with N(t) ≥ target·N(max_t).

Determinism: registers are pure integers (the repo's two-stage portable
hash lanes, kgforge.datapipe.sketch), and the only floats — the
per-node harmonic-mean estimates — are rounded to integer micro-units
BEFORE the cross-node sum, so every output value is an exact integer
sum in any summation order and bit-identical in DuckDB's mirror.

Reference scope: the reference's Jena models have no scale analytics;
this extends SURVEY §2.9's graph-analytics family (pagerank, triangles,
components) with the standard distance-distribution estimator.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.datapipe.sketch import _HLL_W, _stage2


def _per_node_est(regs: DataFrame, m: int, alpha: float) -> DataFrame:
    """(n, bucket, r) register table → (n, est_micro): the standard HLL
    harmonic-mean estimate with linear-counting correction, rounded to
    integer micro-units (1e-6) per node."""
    per = regs.groupBy("n").agg(
        F.count(F.lit(1)).alias("present"),
        F.array_sort(F.collect_list(F.struct("bucket", "r"))).alias("_regs"),
    )
    sum_present = F.aggregate(
        "_regs",
        F.lit(0.0),
        lambda acc, e: acc
        + F.lit(1.0)
        / F.call_function("shiftleft", F.lit(1).cast("long"), e["r"]),
    )
    harm = sum_present + (F.lit(m) - F.col("present")).cast("double")
    raw = F.lit(alpha * m * m) / harm
    zeros = F.lit(m) - F.col("present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per.select(
        "n", F.round(est * 1e6).cast("bigint").alias("est_micro")
    )


def hyperball(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    p: int = 9,
    max_t: int = 8,
    directed: bool = False,
    target: float = 0.9,
) -> DataFrame:
    """edges (src, dst) → one row per radius ``(t, nf, ratio,
    reached_target)``: the estimated number of (ordered) reachable pairs
    within distance t (including the n self-pairs at t=0), its fraction
    of N(max_t), and whether this is a radius at which the fraction
    first meets ``target`` (the effective-diameter flag — exactly one
    true row).

    Runs a FIXED ``max_t`` rounds (no early-exit action), so the whole
    computation is one lazy plan per round plus a final union — callers
    pick max_t at or above the expected effective diameter (a too-small
    max_t under-reports the denominator, same contract as the public
    implementations' budgeted runs).
    """
    if not 7 <= p <= 16:
        raise ValueError("p must be in [7, 16]")
    if max_t < 0:
        raise ValueError("max_t must be >= 0")
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not directed:
        e = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    e = e.distinct().persist()
    nodes = (
        e.select(F.col("s").alias("n"))
        .unionByName(e.select(F.col("d").alias("n")))
        .distinct()
    )

    node_s = F.col("n").cast("string")
    rho = F.when(
        F.col("_rl") > 0, F.length(F.conv(F.expr("_rl & -_rl"), 10, 2))
    ).otherwise(F.lit(_HLL_W + 1))
    regs = (
        nodes.select(
            "n",
            (_stage2(node_s, 31, 1009) % m).alias("bucket"),
            _stage2(node_s, 131, 10007).alias("_rl"),
        )
        .select("n", "bucket", rho.alias("r"))
        .localCheckpoint(eager=True)
    )

    per_round = []
    for t in range(max_t + 1):
        nf_t = _per_node_est(regs, m, alpha).agg(
            F.lit(t).cast("bigint").alias("t"),
            F.sum("est_micro").alias("nf_micro"),
        )
        per_round.append(nf_t)
        if t < max_t:
            merged = regs.unionByName(
                e.join(regs, e["d"] == regs["n"]).select(
                    F.col("s").alias("n"), "bucket", "r"
                )
            )
            regs = (
                merged.groupBy("n", "bucket")
                .agg(F.max("r").alias("r"))
                # each round feeds BOTH the next merge and its own estimate;
                # eager checkpoint computes it once and truncates the tower
                .localCheckpoint(eager=True)
            )
    out = per_round[0]
    for d in per_round[1:]:
        out = out.unionByName(d)
    e.unpersist()

    from pyspark.sql import Window

    # <= max_t+1 rows — never a data-sized window
    full = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    final = F.max(F.when(F.col("t") == max_t, F.col("nf_micro"))).over(full)
    withr = out.withColumn(
        "ratio",
        F.round(F.col("nf_micro").cast("double") / final, 6),
    )
    reached = F.col("ratio") >= target
    first_reach = F.min(F.when(reached, F.col("t"))).over(full)
    return withr.select(
        "t",
        (F.col("nf_micro").cast("double") / 1e6).alias("nf"),
        "ratio",
        (F.col("t") == first_reach).alias("reached_target"),
    )
