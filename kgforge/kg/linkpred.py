"""Common-neighbor link prediction (Adamic-Adar / resource allocation).

The "which edges are missing" query over an undirected graph: for every
non-adjacent unordered pair (a, b) with at least one shared neighbor,

    adamic_adar(a, b) = Σ_{w ∈ N(a)∩N(b)} 1 / ln(deg(w))
    resource_alloc(a, b) = Σ_{w ∈ N(a)∩N(b)} 1 / deg(w)

(Adamic & Adar 2003; Zhou/Lü/Zhang 2009) — the standard unsupervised
baselines for KG completion and recommendation candidate generation.

Scale shape mirrors :mod:`kgforge.kg.nodesim`: candidate pairs exist ONLY
through shared neighbors (one adjacency self-join on the wedge center w),
so the zero-overlap quadratic pair space is never materialized, and the
existing-edge exclusion is a left-anti join against the canonical edge
set.  The self-join cost Σ_w deg(w)² is hub-dominated; ``max_degree``
drops wedges through nodes above the cap — the stop-word bound (a
neighbor shared by everyone carries ~no signal anyway: its 1/ln(deg)
weight is the smallest possible), so capped scores are a strict lower
bound of the exact ones.

Determinism: per-pair weights are folded in SORTED degree order
(collect_list → array_sort → F.aggregate), so the float sum is
partition-order independent — callers should still round for
engine-portable comparison (ln differs in the last ulp across libm
implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.triangles import _canonical


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """(a, b, common, adamic_adar, resource_alloc) for non-adjacent
    unordered pairs sharing ≥ ``min_common`` neighbors (wedge centers
    ≤ ``max_degree`` when set)."""
    und = _canonical(edges, src, dst).persist()
    try:
        adj = und.select(
            F.col("a").alias("w"), F.col("b").alias("n")
        ).unionByName(und.select(F.col("b").alias("w"), F.col("a").alias("n")))
        deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg")).persist()

        centers = deg
        if max_degree is not None:
            centers = deg.filter(F.col("deg") <= max_degree)
        wadj = adj.join(centers.select("w", "deg"), "w")
        lhs = wadj.select("w", "deg", F.col("n").alias("na"))
        rhs = wadj.select("w", F.col("n").alias("nb"))
        pairs = (
            lhs.join(rhs, "w")
            .filter(F.col("na") < F.col("nb"))
            .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
            .agg(
                F.count(F.lit(1)).alias("common"),
                F.array_sort(F.collect_list("deg")).alias("_degs"),
            )
        )
        if min_common > 1:
            pairs = pairs.filter(F.col("common") >= min_common)
        non_edges = pairs.join(und, ["a", "b"], "left_anti")
        out = non_edges.select(
            "a",
            "b",
            "common",
            F.aggregate(
                "_degs",
                F.lit(0.0),
                lambda acc, d: acc + F.lit(1.0) / F.log(d.cast("double")),
            ).alias("adamic_adar"),
            F.aggregate(
                "_degs",
                F.lit(0.0),
                lambda acc, d: acc + F.lit(1.0) / d.cast("double"),
            ).alias("resource_alloc"),
        )
        # materialize before releasing the caches the join tree depends on
        return out.localCheckpoint(eager=True)
    finally:
        und.unpersist()
        try:
            deg.unpersist()
        except NameError:
            pass
