"""Community detection via deterministic label propagation (no GraphFrames).

Synchronous LPA (Raghavan et al. 2007) with the two standard determinism
fixes so the result is a pure function of the graph — identical across
engines, partitionings, and runs:

- every node votes with its OWN current label as well as its neighbors'
  (the self-vote dampens the 2-cycle oscillation synchronous LPA is prone
  to on bipartite-ish structure), and
- ties are broken by the SMALLEST label (count DESC, label ASC), never by
  arrival order or hashing.

Initial label = the node's own id, so labels are drawn from the node-id
domain and the final (node, label) table reads as "node belongs to the
community anchored at label".

Execution shape mirrors ``kgforge.kg.components`` / ``kg.pagerank``: one
shuffle per round (the vote groupBy) plus a per-node window over the vote
counts (bounded by the node's distinct neighbor labels — never a global
window), lineage truncated with an eager ``localCheckpoint`` so plans stay
flat and each label table is computed exactly once.  High-degree nodes
land in a map-side-combinable groupBy, not a join key — hubs do not pin a
reducer.  A driver fast path (below ``driver_threshold`` edges) solves the
same recurrence in plain python dicts: one job instead of O(rounds)
shuffles, the right trade below ~10^5 edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgforge.kg.triangles import _canonical


def _driver_lpa(pairs, iterations: int) -> list[tuple]:
    """Plain-python mirror of the distributed recurrence (exact, not float)."""
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    labels = {v: v for v in nbrs}
    for _ in range(iterations):
        nxt = {}
        for v in nbrs:
            counts: dict = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            counts[labels[v]] = counts.get(labels[v], 0) + 1  # self-vote
            nxt[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return sorted(labels.items())


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    driver_threshold: int = 0,
) -> DataFrame:
    """edges (src, dst) → (node, label) after ``iterations`` synchronous
    LPA rounds with self-vote and count-DESC/label-ASC tie-break.

    Deterministic: the result depends only on the undirected edge set and
    the iteration count.  Isolated nodes never appear (the graph is defined
    by its edges)."""
    if driver_threshold > 0:
        fetched = edges.select(src, dst).limit(driver_threshold + 1).collect()
        if len(fetched) <= driver_threshold:
            pairs = {(min(r[0], r[1]), max(r[0], r[1]))
                     for r in fetched if r[0] != r[1]}
            spark = edges.sparkSession
            dt = dict(edges.dtypes)[src]
            return spark.createDataFrame(
                _driver_lpa(sorted(pairs), iterations),
                schema=f"node {dt}, label {dt}",
            )

    und = _canonical(edges, src, dst).persist()
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionByName(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .persist()
    )
    try:
        labels = (
            adj.select("node").distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=True)
        )
        w = Window.partitionBy("node").orderBy(
            F.col("_c").desc(), F.col("label").asc()
        )
        for _ in range(iterations):
            votes = adj.join(
                labels.withColumnRenamed("node", "nbr"), "nbr"
            ).select("node", "label").unionByName(labels)
            nxt = (
                votes.groupBy("node", "label")
                .agg(F.count(F.lit(1)).alias("_c"))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("node", "label")
                .localCheckpoint(eager=True)
            )
            labels = nxt
        return labels
    finally:
        und.unpersist()
        adj.unpersist()
