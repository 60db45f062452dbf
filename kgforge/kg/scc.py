"""Strongly connected components of a directed graph.

SCCs are the cycle structure a directed KG actually has: mutual-citation
cliques, sameAs loops, redirect rings in URL graphs, the recurrent
classes of an event-transition chain.  GraphX ships
``stronglyConnectedComponents``; this is the same idea re-derived on
DataFrames as the classic FORWARD-BACKWARD COLORING algorithm (Orzan
2004; Slota/Rajamanickam/Madduri 2014):

Per outer round, over the still-unassigned subgraph:

1. **Color**: propagate the MAX node id along edges to fixpoint —
   ``c(v)`` = max active id that can reach v.  Every SCC lies entirely
   inside one color class (mutually reachable nodes are reached by the
   same maxima).
2. **Backward sweep**: from each color ROOT u (``c(u) = u``), walk the
   REVERSED edges restricted to color-u nodes.  A node v with
   ``c(v) = u`` that reaches u is mutually reachable with u (u reaches v
   by the color's definition), so the swept set is exactly SCC(u) —
   and any cycle witnessing the mutual reachability stays inside SCC(u),
   so the color-restricted sweep misses nothing.
3. Settle every root's SCC (many per round — all color regions advance
   together), drop the settled vertices, repeat on the remainder.

Each inner fixpoint is one combinable min/max-groupBy shuffle per round
(O(active diameter) rounds), the loop discipline of
:mod:`kgforge.kg.components`; ``localCheckpoint`` truncates lineage
everywhere state iterates.  Final labels are canonicalized to the MIN id
of each SCC (matching the undirected components convention)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _max_prop(nodes: DataFrame, edges: DataFrame, max_iter: int) -> DataFrame:
    """(node, c): max source-id label propagated along ``edges(u, v)`` to
    fixpoint, starting from c(v) = v."""
    lbl = nodes.select("node", F.col("node").alias("c")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iter):
        incoming = (
            edges.join(
                lbl.select(F.col("node").alias("u"), "c"), "u"
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.max("c").alias("in_c"))
        )
        nxt = (
            lbl.join(incoming, "node", "left")
            .select(
                "node",
                F.greatest("c", F.coalesce("in_c", F.col("c"))).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.join(lbl.withColumnRenamed("c", "old"), "node")
            .filter(F.col("c") != F.col("old"))
            .limit(1)
            .count()
        )
        lbl = nxt
        if not changed:
            return lbl
    raise ValueError(f"max-propagation did not converge in {max_iter} rounds")


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_outer: int = 64,
    max_iter: int = 256,
) -> DataFrame:
    """(node, scc): every vertex labeled with the MIN id of its SCC
    (vertices on no cycle are their own singleton SCC)."""
    e = (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    active = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    assigned = spark.createDataFrame([], "node string, pivot string")
    for _ in range(max_outer):
        if not active.limit(1).count():
            break
        colors = _max_prop(active, e, max_iter)
        # edges whose two endpoints share a color (SCCs never cross colors)
        ecol = (
            e.join(colors.select(F.col("node").alias("u"), "c"), "u")
            .join(
                colors.select(
                    F.col("node").alias("v"), F.col("c").alias("cv")
                ),
                "v",
            )
            .filter(F.col("c") == F.col("cv"))
            .select("u", "v", "c")
            .localCheckpoint(eager=True)
        )
        # backward sweep: settled(v, c) once v reaches the color root c
        settled = colors.filter(F.col("node") == F.col("c")).localCheckpoint(
            eager=True
        )
        frontier = settled
        while True:
            nxt = (
                ecol.join(
                    frontier.select(F.col("node").alias("v"), "c"),
                    ["v", "c"],
                )
                .select(F.col("u").alias("node"), "c")
                .distinct()
                .join(settled, ["node", "c"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if not nxt.limit(1).count():
                break
            settled = settled.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        done = settled.select("node", F.col("c").alias("pivot"))
        assigned = assigned.unionByName(done).localCheckpoint(eager=True)
        active = active.join(done, "node", "left_anti").localCheckpoint(
            eager=True
        )
        e = (
            e.join(active.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(active.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    else:
        raise ValueError(f"SCC did not settle in {max_outer} outer rounds")
    # canonicalize: min member id per pivot group
    mins = assigned.groupBy("pivot").agg(F.min("node").alias("scc"))
    return assigned.join(mins, "pivot").select("node", "scc")
