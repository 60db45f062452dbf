"""Node (neighborhood-Jaccard) similarity over an undirected graph.

The KG-side "which entities play the same role" query: two canonical
entities are similar when their co-mention neighborhoods overlap — the
GraphFrames/GDS ``nodeSimilarity`` surface, built from first principles on
DataFrames.  For every unordered node pair (a, b) that shares at least one
neighbor:

    jaccard(a, b) = |N(a) ∩ N(b)| / (|N(a)| + |N(b)| - |N(a) ∩ N(b)|)

Scale shape: candidate pairs are generated ONLY through shared neighbors —
one self-join of the adjacency list on the common neighbor (every pair with
intersection 0 is never materialized), then a count groupBy and a broadcast
degree join.  The self-join's cost is Σ_w deg(w)², which is dominated by
hub nodes; ``max_degree`` excludes wedges through nodes above the cap — the
standard approximation (a neighbor shared by everyone carries no signal,
exactly the stop-word argument in ``kgforge/kg/lsh.py``'s hot-gram bound).
With the cap on, ``common`` counts the shared neighbors of degree ≤ cap
(super-hub co-membership is treated as noise, the stop-word semantic)
while the denominators keep the TRUE degrees — so capped scores are a
strict lower bound of the exact jaccard, and a pair disappears only when
ALL its shared neighbors are super-hubs.  ``min_sim``
prunes the long tail before it is returned (predicate on the aggregated
row — Catalyst pushes it below the sort when one is added downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.triangles import _canonical


def node_similarity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_sim: float = 0.0,
    max_degree: int | None = None,
) -> DataFrame:
    """(a, b, common, jaccard) for unordered node pairs sharing ≥1 neighbor
    (through a node ≤ ``max_degree`` when set), with jaccard ≥ ``min_sim``."""
    und = _canonical(edges, src, dst).persist()
    try:
        # symmetric adjacency (w = the shared neighbor, n = its endpoint)
        adj = und.select(
            F.col("a").alias("w"), F.col("b").alias("n")
        ).unionByName(und.select(F.col("b").alias("w"), F.col("a").alias("n")))
        deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg")).persist()

        hub_free = adj
        if max_degree is not None:
            hub_free = adj.join(
                deg.filter(F.col("deg") <= max_degree).select("w"), "w"
            )
        lhs = hub_free.select("w", F.col("n").alias("na"))
        rhs = hub_free.select("w", F.col("n").alias("nb"))
        common = (
            lhs.join(rhs, "w")
            .filter(F.col("na") < F.col("nb"))
            .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
            .agg(F.count(F.lit(1)).alias("common"))
        )
        da = deg.select(F.col("w").alias("a"), F.col("deg").alias("da"))
        db = deg.select(F.col("w").alias("b"), F.col("deg").alias("db"))
        out = (
            common.join(da, "a")
            .join(db, "b")
            .select(
                "a",
                "b",
                "common",
                (
                    F.col("common").cast("double")
                    / (F.col("da") + F.col("db") - F.col("common"))
                ).alias("jaccard"),
            )
        )
        if min_sim > 0.0:
            out = out.filter(F.col("jaccard") >= min_sim)
        # materialize before releasing the caches both joins depend on
        return out.localCheckpoint(eager=True)
    finally:
        und.unpersist()
        try:
            deg.unpersist()
        except NameError:
            pass
