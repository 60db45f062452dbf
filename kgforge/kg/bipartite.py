"""Bipartiteness test (2-colorability) per connected component.

A component is bipartite iff its vertices split into two sides with
every edge crossing — equivalently, iff it has no odd cycle.  The test
drives entity-graph sanity checks (a follower/followee projection or a
user–item interaction graph that *should* be 2-sided but isn't reveals
contaminated edges) and decides whether bipartite-only algorithms
(alternating-path matching, bipartite projection) apply.

Distributed shape — two primitives this repo already runs at scale:

1. hash-min connected components label every vertex with its
   component's minimum id (``kgforge/kg/components.py``);
2. ONE multi-source BFS from the set of ALL component roots
   (``kgforge/kg/paths.py:shortest_paths``) — components are disjoint,
   so each vertex's nearest root is its own component's root and the
   BFS costs one frontier loop for the whole graph, not one per
   component.

A vertex's side is ``distance % 2`` (BFS layers from a fixed root
alternate sides in a bipartite component), and an edge joining two
same-parity vertices is a witness of an odd cycle — so one edge⋈parity
join + a per-component aggregate finishes the test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.components import connected_components
from kgforge.kg.paths import shortest_paths


def bipartiteness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 32,
) -> DataFrame:
    """``(comp, n_nodes, n_edges, odd_edges, is_bipartite)`` per
    connected component of the undirected graph ``edges`` (self-loops
    are odd cycles of length 1 and make their component non-bipartite;
    parallel/reversed duplicates are collapsed).

    ``comp`` is the component's minimum vertex id (string — ids are
    compared as strings end-to-end, matching ``shortest_paths``);
    ``odd_edges`` counts distinct canonical edges whose endpoints share
    a BFS parity."""
    e = edges.select(
        F.least(F.col(src).cast("string"), F.col(dst).cast("string")).alias("a"),
        F.greatest(F.col(src).cast("string"), F.col(dst).cast("string")).alias("b"),
    ).distinct()
    loops = e.filter(F.col("a") == F.col("b"))
    e2 = e.filter(F.col("a") != F.col("b")).localCheckpoint(eager=True)

    comp = connected_components(e2, src="a", dst="b", max_iter=max_iter)
    roots = comp.select(F.col("comp")).distinct()
    dist = shortest_paths(
        e2.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        roots,
        directed=False,
        max_iter=max_iter,
    )
    parity = comp.join(dist, comp["node"] == dist["id"]).select(
        "node", "comp", (F.col("distance") % 2).alias("_side")
    )
    pa = parity.select(
        F.col("node").alias("a"),
        F.col("comp"),
        F.col("_side").alias("_sa"),
    )
    pb = parity.select(F.col("node").alias("b"), F.col("_side").alias("_sb"))
    scored = e2.join(pa, "a").join(pb, "b")
    per_edge = scored.select(
        "comp", (F.col("_sa") == F.col("_sb")).cast("int").alias("_odd")
    )
    nodes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("n_nodes"))
    agg = per_edge.groupBy("comp").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("_odd").alias("odd_edges"),
    )
    # a self-loop is an odd edge on its own component (possibly a
    # singleton component absent from e2's component labels)
    loop_nodes = loops.select(F.col("a").alias("node")).distinct()
    loop_comp = loop_nodes.join(comp, "node", "left").select(
        F.coalesce("comp", "node").alias("comp"),
        F.lit(1).cast("bigint").alias("n_edges"),
        F.lit(1).cast("bigint").alias("odd_edges"),
    )
    singleton_loops = loop_comp.join(nodes, "comp", "left_anti").select(
        "comp"
    ).distinct().withColumn("n_nodes", F.lit(1).cast("bigint"))
    all_nodes = nodes.unionByName(singleton_loops)
    all_edges = agg.select("comp", "n_edges", "odd_edges").unionByName(
        loop_comp
    )
    totals = all_edges.groupBy("comp").agg(
        F.sum("n_edges").alias("n_edges"),
        F.sum("odd_edges").alias("odd_edges"),
    )
    return all_nodes.join(totals, "comp", "left").select(
        "comp",
        "n_nodes",
        F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
        F.coalesce("odd_edges", F.lit(0)).alias("odd_edges"),
        (F.coalesce("odd_edges", F.lit(0)) == 0).alias("is_bipartite"),
    )
