"""Topological layering (Kahn) with cycle detection, as a DataFrame loop.

Dependency ordering over a KG's directed relations — class hierarchies,
``partOf`` chains, pipeline DAGs: layer 0 is every vertex with no
incoming edge, layer l+1 is what becomes source-free once layers ≤ l are
removed, i.e. each vertex's layer is the length of the longest path
reaching it.  Vertices that never become source-free sit on or behind a
directed cycle and are flagged instead of ordered — the standard Kahn
outcome, and the cheapest distributed cycle DETECTOR there is (no SCC
machinery when all you need is "is it a DAG and in what order").

Per round: one distinct on live edge heads + one anti-join finds the
source-free frontier, two anti-joins retire it; ``localCheckpoint``
truncates lineage.  Rounds are bounded by the longest path, the
irreducible depth of the dependency graph — each costs a frontier-sized
shuffle, never a pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topological_layers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
) -> DataFrame:
    """``(node, layer, is_cyclic)`` for every vertex of ``edges``.

    ``layer`` is the longest-path depth (0 for pure sources); nodes on
    or downstream-locked behind a directed cycle get ``layer`` null and
    ``is_cyclic`` true.  Self-loops are cycles.  Raises if a (long) DAG
    needs more than ``max_iter`` layers — raise the bound, the loop is
    O(longest path) by nature."""
    e = edges.select(
        F.col(src).cast("string").alias("s"),
        F.col(dst).cast("string").alias("t"),
    ).distinct().localCheckpoint(eager=True)
    live_nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    live_edges = e
    spark = edges.sparkSession
    done = spark.createDataFrame([], "node string, layer bigint")

    for layer in range(max_iter):
        if not live_nodes.limit(1).count():
            break
        heads = live_edges.select(F.col("t").alias("node")).distinct()
        frontier = live_nodes.join(heads, "node", "left_anti")
        if not frontier.limit(1).count():
            break  # every remaining node has an incoming edge: cycle(s)
        done = done.unionByName(
            frontier.withColumn("layer", F.lit(layer).cast("bigint"))
        ).localCheckpoint(eager=True)
        live_nodes = live_nodes.join(
            frontier, "node", "left_anti"
        ).localCheckpoint(eager=True)
        live_edges = live_edges.join(
            frontier.select(F.col("node").alias("s")), "s", "left_anti"
        ).localCheckpoint(eager=True)
    else:
        if live_nodes.limit(1).count():
            raise ValueError(
                f"DAG deeper than max_iter={max_iter} (or undetected cycle)"
            )
    cyclic = live_nodes.select(
        "node",
        F.lit(None).cast("bigint").alias("layer"),
        F.lit(True).alias("is_cyclic"),
    )
    return done.withColumn("is_cyclic", F.lit(False)).unionByName(cyclic)
