"""Exact 4-cycle (rectangle/square) counting, hub-immune.

Rectangles are the next motif after triangles — in a KG they witness
"two entities sharing two distinct contexts" (the signal behind
co-citation similarity and butterfly counting in bipartite link tables).
The naive λ-pair method — count common neighbors λ(p,q) for every pair,
then Σ C(λ,2)/2 — enumerates all wedges through every node, which is
Θ(d²) at a hub: a million-degree celebrity produces 10¹² wedges.

This module uses the degree-orientation decomposition (the same ≺ order
as ``triangles.py``: v ≺ u iff (deg, id) smaller, out-degree ≤ √(2m)).
Classify each common neighbor x of a pair {p, q} by where it sits in the
total order: LOW (x ≺ both), MID (strictly between), HIGH (x ≻ both).
Charging every 4-cycle to its order-minimum vertex — which is always a
LOW common neighbor of its own wedge pair — gives the exact identity

    #C4  =  Σ_pairs  C(λ_low, 2)  +  λ_low · (λ_mid + λ_high)

with every term enumerable in O(m·√m) total work:

- λ_low:   out-out wedge self-join on the center (out-deg ≤ √(2m));
- λ_mid:   in×out wedges per center — Σ in·out ≤ √(2m)·Σ in = O(m√m);
- λ_high:  only needed for pairs with λ_low ≥ 1 (already materialized);
           per candidate pair, join p's out-edges (≤ √(2m)) and probe
           q's — never through a hub's full neighbor list.

Each pair {x, y} of common neighbors of {p, q} IS a distinct 4-cycle
x–p–y–q; the identity counts it exactly when min(x, y) is LOW, which
happens for exactly one of the cycle's two diagonal pairs (the one whose
centers include the cycle's global minimum).  Proof sketch in the tests'
brute-force mirror (`tests/test_motifs.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.triangles import oriented_edges


def _pair_counts(edges: DataFrame, src: str, dst: str,
                 caches: list) -> DataFrame:
    """(a, b, n_low, n_mid, n_high) for id-canonical pairs with
    n_low ≥ 1 — the candidate distance-2 pairs of the decomposition."""
    o = oriented_edges(edges, src, dst, caches=caches).persist()
    caches.append(o)
    # LOW: center c ≺ both endpoints -> out-out wedges, pair by id order
    e1 = o.select(F.col("u").alias("c"), F.col("v").alias("p"))
    e2 = o.select(F.col("u").alias("c"), F.col("v").alias("q"))
    low = (
        e1.join(e2, "c")
        .filter(F.col("p") < F.col("q"))
        .groupBy(F.col("p").alias("a"), F.col("q").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_low"))
        .persist()
    )
    caches.append(low)
    # MID: p ≺ c ≺ q -> an in-edge chained to an out-edge at the center
    mid = (
        o.select(F.col("u").alias("p"), F.col("v").alias("c"))
        .join(o.select(F.col("u").alias("c"), F.col("v").alias("q")), "c")
        .groupBy(
            F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_mid"))
    )
    # HIGH: center ≻ both — computed ONLY for the λ_low ≥ 1 candidates:
    # expand candidate a over its ≻-edges (bounded fan-out), probe b's
    high = (
        low.select("a", "b")
        .join(o.select(F.col("u").alias("a"), F.col("v").alias("c")), "a")
        .join(
            o.select(F.col("u").alias("b"), F.col("v").alias("c")),
            ["b", "c"],
            "left_semi",
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_high"))
    )
    return (
        low.join(mid, ["a", "b"], "left")
        .join(high, ["a", "b"], "left")
        .select(
            "a",
            "b",
            "n_low",
            F.coalesce("n_mid", F.lit(0)).alias("n_mid"),
            F.coalesce("n_high", F.lit(0)).alias("n_high"),
        )
    )


def square_pairs(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(a, b, n_low, n_common) — every id-canonical pair with at least one
    order-LOW common neighbor, its LOW count and its TOTAL common-neighbor
    count (λ = n_low + n_mid + n_high).  These are exactly the pairs the
    rectangle identity charges cycles to."""
    caches: list = []
    try:
        pc = _pair_counts(edges, src, dst, caches)
        return (
            pc.select(
                "a",
                "b",
                "n_low",
                (F.col("n_low") + F.col("n_mid") + F.col("n_high")).alias(
                    "n_common"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        for c in caches:
            c.unpersist()


def square_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One row (n_squares,): the exact number of 4-cycles, by the
    min-vertex charging identity (docstring above).  Cross-validated by an
    independent Σ C(λ,2)/2 oracle over ALL pairs in the test suite."""
    caches: list = []
    try:
        pc = _pair_counts(edges, src, dst, caches)
        agg = pc.agg(
            F.coalesce(
                F.sum(
                    F.col("n_low") * (F.col("n_low") - 1) / 2
                    + F.col("n_low") * (F.col("n_mid") + F.col("n_high"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_squares")
        )
        n = agg.collect()[0]["n_squares"]
    finally:
        for c in caches:
            c.unpersist()
    return edges.sparkSession.createDataFrame([(n,)], "n_squares bigint")
