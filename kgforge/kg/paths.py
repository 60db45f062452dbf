"""Multi-source BFS shortest paths over a KG edge relation.

The GraphFrames-style ``bfs``/``shortestPaths`` surface for the entity
graphs this engine materializes (co-mention edges, ``nearDuplicateOf``
clusters, reporting hierarchies) — a primitive neither the reference's
SPARQL templates nor plain DataFrame ops give directly: property-path
closure answers *reachability*, this answers *distance*.

Semi-naive level-synchronous BFS, the same loop discipline as
``kgforge/kg/components.py`` and ``kgforge/sparql.py:_path_rel``: each
round expands only the current frontier (one equi-join against the edge
table), anti-joins everything already settled, and ``localCheckpoint``s so
the plan stays flat.  Level order IS distance order for unweighted edges,
so a vertex is settled the first round it appears — no min-recomputation,
no re-visits.  Rounds are bounded by the graph's diameter; per-round cost
is one shuffle of the frontier (≤ V rows), never a pair set.  Skewed
out-degrees are AQE's problem (the frontier⋈edges join is a plain
equi-join, salting-compatible if a hub ever dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges: DataFrame,
    sources,
    directed: bool = True,
    max_iter: int = 256,
) -> DataFrame:
    """Hop-count distances from a source set over ``edges(src, dst)``.

    ``sources`` is a list of vertex ids or a single-column DataFrame.
    Returns ``(id, distance)`` for every REACHABLE vertex (sources at 0);
    unreachable vertices are absent, mirroring GraphFrames ``bfs``.
    ``directed=False`` walks both edge directions.
    """
    spark = edges.sparkSession
    e = edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct()

    if isinstance(sources, DataFrame):
        src = sources.select(F.col(sources.columns[0]).cast("string").alias("id"))
    else:
        src = spark.createDataFrame([(str(s),) for s in sources], "id string")
    settled = (
        src.distinct().withColumn("distance", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    frontier = settled
    for _ in range(max_iter):
        nxt = (
            frontier.join(e, frontier["id"] == e["src"])
            .select(
                F.col("dst").alias("id"),
                (F.col("distance") + F.lit(1)).alias("distance"),
            )
            .groupBy("id")
            .agg(F.min("distance").alias("distance"))
            .join(settled, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if not nxt.limit(1).count():
            return settled
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    raise ValueError(f"BFS did not converge in {max_iter} rounds")


def pairwise_distances(
    edges: DataFrame,
    sources,
    directed: bool = True,
    max_iter: int = 256,
) -> DataFrame:
    """Hop-count distances keyed by source: ``(source, id, distance)`` for
    every source in ``sources`` and every vertex reachable from it.

    The landmark primitive: ONE synchronized level loop advances ALL
    sources together (state is O(|S|·V) rows, each round one frontier⋈edges
    shuffle + one anti-join), instead of |S| sequential BFS jobs — at scale
    a landmark set of 16-64 seeds costs diameter rounds total, not
    diameter×|S|.  Same settled-first discipline as :func:`shortest_paths`
    (level order is distance order), anti-join keyed on (source, id)."""
    spark = edges.sparkSession
    e = edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct()

    if isinstance(sources, DataFrame):
        src = sources.select(
            F.col(sources.columns[0]).cast("string").alias("source")
        )
    else:
        src = spark.createDataFrame([(str(s),) for s in sources], "source string")
    settled = (
        src.distinct()
        .select("source", F.col("source").alias("id"),
                F.lit(0).cast("bigint").alias("distance"))
        .localCheckpoint(eager=True)
    )
    frontier = settled
    for _ in range(max_iter):
        nxt = (
            frontier.join(e, frontier["id"] == e["src"])
            .select(
                "source",
                F.col("dst").alias("id"),
                (F.col("distance") + F.lit(1)).alias("distance"),
            )
            .groupBy("source", "id")
            .agg(F.min("distance").alias("distance"))
            .join(settled, ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if not nxt.limit(1).count():
            return settled
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    raise ValueError(f"BFS did not converge in {max_iter} rounds")


def eccentricity(
    edges: DataFrame,
    sources,
    directed: bool = False,
) -> DataFrame:
    """(source, ecc, n_reached): each source's eccentricity — the max hop
    distance to any vertex it can reach (0 when it reaches nothing) — plus
    the reachable-others count.  max(ecc) over all vertices is the graph
    diameter, min(ecc) the radius; like :func:`closeness` this is exact for
    the given source set, and the landmark-sample version is the scale play
    (all-pairs eccentricity at 100 TB is not a thing — landmarks give the
    standard diameter lower bound)."""
    d = pairwise_distances(edges, sources, directed=directed)
    return d.groupBy("source").agg(
        F.max("distance").alias("ecc"),
        F.sum(F.when(F.col("distance") > 0, 1).otherwise(0)).alias("n_reached"),
    )


def closeness(
    edges: DataFrame,
    sources,
    directed: bool = False,
) -> DataFrame:
    """Closeness + harmonic centrality of each source vertex:
    ``(source, n_reached, total_dist, closeness, harmonic)`` where
    ``n_reached`` counts reachable OTHERS, ``closeness`` is
    n_reached/total_dist (0 when nothing is reachable) and ``harmonic`` is
    Σ 1/d — the disconnection-robust variant.  Exact for the given source
    set; pass a landmark sample at scale (all-pairs closeness on a 100-TB
    graph is not a thing)."""
    d = pairwise_distances(edges, sources, directed=directed)
    others = d.filter(F.col("distance") > 0)
    per = others.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum("distance").alias("total_dist"),
        F.sum(F.lit(1.0) / F.col("distance")).alias("harmonic"),
    )
    # sources that reach nothing still appear, with zeros
    base = d.filter(F.col("distance") == 0).select("source").distinct()
    return (
        base.join(per, "source", "left")
        .select(
            "source",
            F.coalesce(F.col("n_reached"), F.lit(0)).alias("n_reached"),
            F.coalesce(F.col("total_dist"), F.lit(0)).alias("total_dist"),
            F.when(
                F.coalesce(F.col("total_dist"), F.lit(0)) > 0,
                F.col("n_reached").cast("double") / F.col("total_dist"),
            ).otherwise(F.lit(0.0)).alias("closeness"),
            F.coalesce(F.col("harmonic"), F.lit(0.0)).alias("harmonic"),
        )
    )


def weighted_shortest_paths(
    edges: DataFrame,
    sources,
    weight_col: str = "w",
    directed: bool = True,
    max_iter: int = 64,
) -> DataFrame:
    """Min-cost distances from a source set over weighted
    ``edges(src, dst, w)`` with non-negative integer weights — distributed
    Bellman-Ford with a changed-vertex frontier.

    Each round relaxes only edges out of vertices improved last round
    (one frontier⋈edges shuffle + a min-merge groupBy — never a pair
    set), so total work is O(E × longest-optimal-hop-count) worst case
    but frontier-bounded in practice, the same loop discipline as the
    BFS above.  Distances stay exact int64 (no float accumulation).
    Returns ``(id, distance)`` for every reachable vertex; raises on a
    negative weight (Bellman-Ford's contract here is shortest-path, not
    negative-cycle detection)."""
    spark = edges.sparkSession
    e = edges.select(
        F.col("src").cast("string"),
        F.col("dst").cast("string"),
        F.col(weight_col).cast("long").alias("w"),
    )
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    e = e.groupBy("src", "dst").agg(F.min("w").alias("w"))
    e = e.localCheckpoint(eager=True)
    if e.filter(F.col("w") < 0).limit(1).count():
        raise ValueError("weighted_shortest_paths requires w >= 0")

    if isinstance(sources, DataFrame):
        src = sources.select(
            F.col(sources.columns[0]).cast("string").alias("id")
        )
    else:
        src = spark.createDataFrame([(str(s),) for s in sources], "id string")
    dist = (
        src.distinct()
        .withColumn("distance", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier["id"] == e["src"])
            .select(
                F.col("dst").alias("id"),
                (F.col("distance") + F.col("w")).alias("distance"),
            )
            .groupBy("id")
            .agg(F.min("distance").alias("distance"))
        )
        improved = (
            cand.join(
                dist.select("id", F.col("distance").alias("_old")),
                "id",
                "left",
            )
            .filter(F.col("_old").isNull() | (F.col("distance") < F.col("_old")))
            .select("id", "distance")
            .localCheckpoint(eager=True)
        )
        if not improved.limit(1).count():
            return dist
        dist = (
            dist.unionByName(improved)
            .groupBy("id")
            .agg(F.min("distance").alias("distance"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    raise ValueError(f"Bellman-Ford did not converge in {max_iter} rounds")
