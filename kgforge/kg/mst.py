"""Minimum spanning forest as an iterated DataFrame loop (Borůvka).

Borůvka's algorithm is the parallel-native MST construction (Kruskal and
Prim are inherently sequential): every round, every component selects its
minimum-weight outgoing edge, all selected edges join the forest at once,
and touching components merge.  The component count at least halves per
round, so the loop runs O(log V) rounds regardless of graph shape.

Determinism: edges are canonicalized to ``a < b`` and totally ordered by
``(w, a, b)``; under a total order the minimum spanning forest is unique,
so the result is a pure function of the data — reproducible across
partitionings, retries, and resume, and mirrorable in an external oracle.

Scale shape (the 100-TB contract): each round is two map-side-combinable
min-aggregations over the *live* cross-component edge set (which only
shrinks — intra-component edges are dropped as soon as their endpoints
merge), plus a connected-components pass over the picked-edge graph whose
size is bounded by the current component count (geometrically shrinking).
There is never a pair set, never a single-partition window, and lineage is
truncated each round with localCheckpoint so plans stay flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.components import connected_components


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "w",
    max_rounds: int = 40,
    component_driver_threshold: int = 100_000,
) -> DataFrame:
    """Undirected MSF over ``edges(src, dst, w)`` → forest edges
    ``(a, b, w)`` with ``a < b``.

    Parallel edges collapse to their minimum weight; self-loops are
    dropped; ties break on ``(w, a, b)`` so the forest is the unique MSF
    of the totally-ordered edge set.  Ids may be any orderable type
    (numeric or string); the tie-break follows that type's ordering.
    ``component_driver_threshold`` is forwarded to the per-round
    components pass (the picked-edge graph has at most one edge per
    component, so the driver fast path is safe far beyond fixture
    scale)."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
            F.col(weight_col).alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    # live cross-component edges carry their endpoints' current labels
    live = e.select(
        F.col("a").alias("ca"), F.col("b").alias("cb"), "w", "a", "b"
    ).localCheckpoint(eager=True)
    forest = e.filter(F.lit(False)).select("a", "b", "w")

    for _ in range(max_rounds):
        if not live.limit(1).count():
            return forest
        sides = live.select(
            F.col("ca").alias("comp"), "w", "a", "b", "ca", "cb"
        ).unionByName(
            live.select(F.col("cb").alias("comp"), "w", "a", "b", "ca", "cb")
        )
        picked = (
            sides.groupBy("comp")
            .agg(F.min(F.struct("w", "a", "b", "ca", "cb")).alias("m"))
            .select("m.*")
            .distinct()
            .localCheckpoint(eager=True)
        )
        forest = forest.unionByName(
            picked.select("a", "b", "w")
        ).localCheckpoint(eager=True)
        compmap = connected_components(
            picked.select("ca", "cb"),
            src="ca",
            dst="cb",
            driver_threshold=component_driver_threshold,
        ).select(
            F.col("node").alias("_oldc"), F.col("comp").alias("_newc")
        )
        ma = compmap.withColumnRenamed("_oldc", "_ca_old").withColumnRenamed(
            "_newc", "_ca_new"
        )
        mb = compmap.withColumnRenamed("_oldc", "_cb_old").withColumnRenamed(
            "_newc", "_cb_new"
        )
        live = (
            live.join(ma, live["ca"] == ma["_ca_old"], "left")
            .join(mb, live["cb"] == mb["_cb_old"], "left")
            .select(
                F.coalesce(F.col("_ca_new"), F.col("ca")).alias("ca"),
                F.coalesce(F.col("_cb_new"), F.col("cb")).alias("cb"),
                "w",
                "a",
                "b",
            )
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=True)
        )
    raise ValueError(f"Borůvka did not converge in {max_rounds} rounds")
