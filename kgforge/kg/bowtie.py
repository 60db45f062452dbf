"""Bow-tie decomposition of a digraph (Broder et al. 2000, "Graph
structure in the Web"): relative to the LARGEST strongly connected
component (the core), every node is

    core  — inside the largest SCC,
    in    — reaches the core but is not in it,
    out   — reachable from the core but not in it,
    other — everything else (tendrils, tubes, disconnected pieces,
            merged: distinguishing them needs the in/out sets' closures,
            which callers can compose from the same primitives).

The macroscopic shape diagnostic for crawl/link graphs — "how much of the
graph can a core-seeded traversal ever see" is exactly |core|+|out|.

Built from two primitives that already have the right scale shape:
``strongly_connected_components`` (FB-coloring rounds) and a frontier BFS
(one equi-join + anti-join per round, localCheckpoint to keep lineage
flat, O(diameter) rounds).  The core is chosen by (size DESC, label ASC)
— deterministic under ties.

Node ids are compared AS STRINGS (the SCC primitive's convention), so
mins and the core tie-break are lexicographic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.scc import strongly_connected_components


def _reach(seed: DataFrame, e: DataFrame, max_iter: int) -> DataFrame:
    """All nodes reachable from ``seed`` over edges (u -> v), seed included.
    ``seed``/result schema: (node)."""
    visited = seed.localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_iter):
        nxt = (
            e.join(frontier.select(F.col("node").alias("u")), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if not nxt.limit(1).count():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def bowtie_decomposition(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
) -> DataFrame:
    """One row per part: ``(part, n_nodes, min_node)`` — min lexicographic;
    parts with zero nodes are absent."""
    e = (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    scc = strongly_connected_components(e, "u", "v")
    core_label = (
        scc.groupBy("scc")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), F.asc("scc"))
        .limit(1)
        .select("scc")
    )
    core = (
        scc.join(F.broadcast(core_label), "scc")
        .select("node")
        .localCheckpoint(eager=True)
    )
    fwd = _reach(core, e, max_iter)
    bwd = _reach(
        core, e.select(F.col("v").alias("u"), F.col("u").alias("v")), max_iter
    )
    labeled = (
        nodes.join(core.withColumn("_c", F.lit(1)), "node", "left")
        .join(fwd.withColumn("_f", F.lit(1)), "node", "left")
        .join(bwd.withColumn("_b", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("_c").isNotNull(), "core")
            .when(F.col("_b").isNotNull(), "in")
            .when(F.col("_f").isNotNull(), "out")
            .otherwise("other")
            .alias("part"),
        )
    )
    return labeled.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.min("node").alias("min_node"),
    )
