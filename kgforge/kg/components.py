"""Connected components as an iterated DataFrame loop (no GraphFrames jar).

Hash-min label propagation: every node repeatedly adopts the minimum label in
its closed neighborhood until fixpoint.  Converges in O(diameter) rounds —
surface-form duplicate clusters have tiny diameters.  Each round is one
shuffle; lineage is truncated with localCheckpoint so plans stay flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "a", dst: str = "b", max_iter: int = 25
) -> DataFrame:
    """edges (src, dst) → (node, component) with component = min node id."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    und = und.persist()
    nodes = und.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("comp", F.col("node")).persist()

    for _ in range(max_iter):
        msgs = (
            und.join(labels, und["u"] == labels["node"])
            .select(F.col("v").alias("node"), F.col("comp"))
        )
        new_labels = (
            labels.select("node", "comp")
            .unionByName(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels
