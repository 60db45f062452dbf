"""Deterministic Jones–Plassmann greedy graph coloring.

Graph coloring is the conflict-scheduling primitive over a KG: nodes with
the same color share no edge, so same-colored entity clusters can be
rewritten / anonymized / merged in the same parallel pass without locks
(the same role MIS plays, but covering EVERY node with a small palette).

Jones & Plassmann (1993): give every node a random priority; a node
colors itself once every neighbor with smaller priority is already
colored, taking the smallest color absent among its colored neighbors
(the mex).  Nodes coloring in the same round are pairwise non-adjacent
(two adjacent actives can't both be local priority minima), so rounds
are conflict-free and the coloring is proper by construction.  Expected
O(log n / log log n) rounds on bounded-degree graphs.

Randomness is replaced by the portable ``poly_hash`` of the node id
(ties by id string) — the same determinism move as ``kg/mis.py`` — so
the palette is a pure function of the edge set, identical across
engines and partitionings, and an unrolled SQL mirror reproduces every
color exactly.

Scale shape per round: one groupBy(node) min-aggregate over active
edges (map-side combinable), one join collecting colored-neighbor
palettes for the round's winners (fan-in bounded by the winner's
degree), anti-joins to deactivate, eager localCheckpoint to truncate
lineage.  The mex is a JVM higher-order expression over the winner's
own sorted palette — no Python, no driver traffic beyond the one
convergence scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.datapipe.dedup import poly_hash
from kgforge.kg.triangles import _canonical


def _prio(c):
    return F.struct(
        poly_hash(c.cast("string")).alias("p"),
        c.cast("string").alias("id"),
    )


def _py_prio(v) -> tuple:
    acc = 0
    for ch in str(v):
        acc = (acc * 31 + ord(ch)) % 2147483647
    return (acc, str(v))


def _py_coloring(pairs) -> dict:
    """Plain-python mirror: node -> (color, round)."""
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    colors: dict = {}
    active = set(nbrs)
    r = 1
    while active:
        winners = [
            v
            for v in active
            if all(_py_prio(v) < _py_prio(u) for u in nbrs[v] if u in active)
        ]
        for v in winners:
            used = {colors[u][0] for u in nbrs[v] if u in colors}
            c = 0
            while c in used:
                c += 1
            colors[v] = (c, r)
        active -= set(winners)
        r += 1
    return colors


def greedy_coloring(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """edges (src, dst) → (node, color, round): a proper coloring of the
    undirected graph (no edge is monochromatic), deterministic via hash
    priorities.  Isolated nodes don't appear (no edges → no conflicts)."""
    active_edges = _canonical(edges, src, dst).localCheckpoint(eager=True)
    und = active_edges  # full (checkpointed) edge set, kept for palettes
    active_nodes = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    dt = dict(edges.dtypes)[src]
    colored = spark.createDataFrame(
        [], schema=f"node {dt}, color int, round int"
    )
    for r in range(1, max_rounds + 1):
        if not active_nodes.limit(1).count():
            return colored
        adj = active_edges.select(
            F.col("a").alias("node"), F.col("b").alias("nbr")
        ).unionByName(
            active_edges.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
        )
        nbr_min = adj.groupBy("node").agg(F.min(_prio(F.col("nbr"))).alias("m"))
        winners = (
            active_nodes.join(nbr_min, "node", "left")
            .filter(F.col("m").isNull() | (_prio(F.col("node")) < F.col("m")))
            .select("node")
            .localCheckpoint(eager=True)
        )
        # palette: colors already held by the winner's FULL neighborhood
        # (und is undirected-canonical; expand both directions)
        full_adj = und.select(
            F.col("a").alias("node"), F.col("b").alias("nbr")
        ).unionByName(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        used = (
            winners.join(full_adj, "node")
            .join(
                colored.select(F.col("node").alias("nbr"), "color"), "nbr"
            )
            .groupBy("node")
            .agg(F.array_sort(F.collect_set("color")).alias("used"))
        )
        # mex = smallest k in [0, |used|] not present (sequence is
        # inclusive, so the palette can never be exhausted)
        mex = F.array_min(
            F.filter(
                F.sequence(F.lit(0), F.size(F.col("used"))),
                lambda k: ~F.array_contains(F.col("used"), k),
            )
        )
        newly = (
            winners.join(used, "node", "left")
            .select(
                "node",
                F.when(F.col("used").isNull(), F.lit(0))
                .otherwise(mex)
                .cast("int")
                .alias("color"),
                F.lit(r).alias("round"),
            )
        )
        colored = colored.unionByName(newly).localCheckpoint(eager=True)
        active_nodes = active_nodes.join(
            winners, "node", "left_anti"
        ).localCheckpoint(eager=True)
        active_edges = (
            active_edges.join(
                winners.select(F.col("node").alias("a")), "a", "left_anti"
            )
            .join(winners.select(F.col("node").alias("b")), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    raise ValueError(f"coloring did not converge in {max_rounds} rounds")
