"""PageRank as an iterated DataFrame loop (no GraphFrames jar).

Standard damped PageRank (Page et al. 1999) with a fixed iteration count —
the shape a KG user runs over the materialized entity graph to rank
canonical entities by centrality.  Same execution strategy as
``kgforge.kg.components``: each iteration is one shuffle (groupBy on the
destination node), lineage truncated with an eager ``localCheckpoint`` so
plans stay flat and the rank table is computed exactly once per round
(``ranks`` feeds both the contribution join and the dangling-mass
aggregate — without the checkpoint the double reference doubles the
lineage every iteration).  Dangling nodes (no out-edges) redistribute
their mass uniformly, so total rank stays 1.0 every iteration.

Scale notes (100 TB): the edge table is the big side; per iteration it is
joined once against the one-row-per-node rank table and aggregated by
destination.  High-in-degree entities land in a groupBy (map-side
combinable partial aggregation), not a join key, so hot nodes do not pin a
reducer.  The dangling term is a broadcast one-row cross join, never a
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """edges (src, dst) → (node, rank) after ``iterations`` damped rounds.

    Nodes are every id appearing as src or dst.  Initial rank 1/N.  Each
    round: rank' = (1-d)/N + d * (Σ_in rank/outdeg + dangling_mass/N).
    Deterministic up to float-summation order (callers comparing across
    engines should round).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edges annotated with the sender's out-degree, reused every iteration
    e_deg = e.join(outdeg, "src").persist()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for i in range(iterations):
        contrib = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # mass parked on dangling nodes (no out-edges) spreads uniformly;
        # one-row aggregate folded into the plan via broadcast cross join
        dang = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0))
                       + F.col("_dm") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        # eager: computes this round once and truncates lineage (ranks is
        # referenced twice next round); final round too, so the caches can
        # be released before returning
        ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    e_deg.unpersist()
    return ranks
