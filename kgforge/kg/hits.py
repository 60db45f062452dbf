"""HITS hubs & authorities as an iterated DataFrame loop (no GraphFrames).

Kleinberg's HITS (1999) with L1 normalization each half-step, fixed
iteration count — the companion centrality to ``kgforge.kg.pagerank`` for
DIRECTED role asymmetry: a node is a good hub when it points at good
authorities and vice versa.  L1 (sum) normalization instead of the paper's
L2 keeps every arithmetic step a plain sum/divide, so an unrolled SQL
mirror computes the identical recurrence (up to float-summation order —
compare rounded).

Execution shape per iteration: two shuffles (groupBy dst for the authority
pass, groupBy src for the hub pass) + two one-row normalization aggregates
folded back with a broadcast cross join — no driver collect inside the
loop.  High-in-degree authorities land in a map-side-combinable groupBy.
State (node, hub, auth) is eagerly ``localCheckpoint``-ed per round so the
double reference (join + normalizer) is computed once and plans stay flat.
A driver fast path below ``driver_threshold`` edges runs the same
recurrence in numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_hits(rows, iterations: int) -> list[tuple]:
    """numpy mirror of the distributed recurrence (same formula; results
    agree up to float-summation order)."""
    import numpy as np

    nodes = sorted({u for u, _ in rows} | {v for _, v in rows})
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    src = np.fromiter((idx[u] for u, _ in rows), dtype=np.int64, count=len(rows))
    dst = np.fromiter((idx[v] for _, v in rows), dtype=np.int64, count=len(rows))
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(iterations):
        auth = np.bincount(dst, weights=hub[src], minlength=n)
        auth /= auth.sum()
        hub = np.bincount(src, weights=auth[dst], minlength=n)
        hub /= hub.sum()
    return [(nodes[i], float(hub[i]), float(auth[i])) for i in range(n)]


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    driver_threshold: int = 0,
) -> DataFrame:
    """edges (src, dst) → (node, hub, auth) after ``iterations`` L1-normalized
    HITS rounds.  Nodes are every id appearing as src or dst; initial hub
    1/N, duplicate edges collapse (the relation is a set)."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()

    if driver_threshold > 0:
        fetched = e.limit(driver_threshold + 1).collect()
        if len(fetched) <= driver_threshold:
            rows = [(r[0], r[1]) for r in fetched]
            spark = edges.sparkSession
            dt = dict(edges.dtypes)[src]
            return spark.createDataFrame(
                _driver_hits(rows, iterations),
                schema=f"node {dt}, hub double, auth double",
            )

    e = e.persist()
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
        n = nodes.count()  # one scalar, outside the loop
        state = nodes.withColumn("hub", F.lit(1.0 / n)).localCheckpoint(eager=True)
        for _ in range(iterations):
            araw = (
                e.join(state.select(F.col("node").alias("src"), "hub"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub").alias("_a"))
            )
            anorm = araw.agg(F.sum("_a").alias("_s"))
            auths = (
                nodes.join(araw, "node", "left")
                .crossJoin(F.broadcast(anorm))
                .select(
                    "node",
                    (F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_s")).alias("auth"),
                )
                .localCheckpoint(eager=True)
            )
            hraw = (
                e.join(auths.select(F.col("node").alias("dst"), "auth"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("auth").alias("_h"))
            )
            hnorm = hraw.agg(F.sum("_h").alias("_s"))
            state = (
                nodes.join(hraw, "node", "left")
                .crossJoin(F.broadcast(hnorm))
                .select(
                    "node",
                    (F.coalesce(F.col("_h"), F.lit(0.0)) / F.col("_s")).alias("hub"),
                )
                .join(auths, "node")
                .localCheckpoint(eager=True)
            )
        return state.select("node", "hub", "auth")
    finally:
        e.unpersist()
        try:
            nodes.unpersist()
        except NameError:
            pass
