"""Time-respecting (temporal) graph reachability.

A temporal edge ``(u, v, t)`` can only be traversed AT time t, and a
time-respecting path must use nondecreasing times — the model for "could
information have flowed from A to B" over interaction logs (Holme &
Saramäki, "Temporal networks", Physics Reports 2012).  Static reachability
over the same edges OVERSTATES influence: u→v@5 then v→w@3 is a static
path but not a temporal one.

The operator computes EARLIEST ARRIVAL times from a source set by frontier
relaxation, the temporal analogue of Bellman-Ford:

    arr(s) = t0 for sources;  arr(v) ≤ t  for every edge (u, v, t)
    with t ≥ arr(u)

iterated until no arrival improves.  Times are int64 (epoch micros or any
integer clock) — all exact, no float anywhere, so an external oracle can
replay rounds verbatim as unrolled CTEs.

Scale shape: per round ONE frontier⋈edges join (frontier = vertices whose
arrival improved last round, never the full vertex set) + a min-merge
groupBy.  Rounds are bounded by the longest optimal temporal-hop count,
as in :func:`kgforge.kg.paths.weighted_shortest_paths`; localCheckpoint
between rounds caps the plan tower.

No counterpart in the reference (its graphs are static Jena models); this
serves the event-log analytics side of the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_reachability(
    edges: DataFrame,
    sources,
    t0: int = 0,
    src: str = "src",
    dst: str = "dst",
    ts: str = "ts",
    max_iter: int = 64,
) -> DataFrame:
    """edges (src, dst, ts:int64) + source ids → ``(id, arrival)``: the
    earliest time each vertex is reachable from any source by a
    time-respecting path starting at or after ``t0``.  Sources report
    ``arrival = t0``; unreachable vertices are absent."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.col(src).cast("string").alias("src"),
            F.col(dst).cast("string").alias("dst"),
            F.col(ts).cast("long").alias("t"),
        )
        .filter(F.col("t").isNotNull())
        .localCheckpoint(eager=True)
    )
    if isinstance(sources, DataFrame):
        s = sources.select(F.col(sources.columns[0]).cast("string").alias("id"))
    else:
        s = spark.createDataFrame([(str(x),) for x in sources], "id string")
    arr = (
        s.distinct()
        .withColumn("arrival", F.lit(int(t0)).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    frontier = arr
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier["id"] == e["src"])
            .filter(F.col("t") >= F.col("arrival"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("t").alias("arrival"))
        )
        improved = (
            cand.join(
                arr.select("id", F.col("arrival").alias("_old")), "id", "left"
            )
            .filter(F.col("_old").isNull() | (F.col("arrival") < F.col("_old")))
            .select("id", "arrival")
            .localCheckpoint(eager=True)
        )
        if not improved.limit(1).count():
            return arr
        arr = (
            arr.unionByName(improved)
            .groupBy("id")
            .agg(F.min("arrival").alias("arrival"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    raise ValueError(f"temporal reachability did not settle in {max_iter} rounds")
