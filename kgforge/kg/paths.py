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
