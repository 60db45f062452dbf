"""Maximal matching as an iterated DataFrame loop (locally-minimal edges).

A matching (no two edges share a vertex) that is maximal (no edge can be
added) — the symmetry-breaking primitive behind distributed contraction,
pair-assignment, and entity-merge schedules.  Per round every edge gets a
round-salted hash priority; an edge whose priority is the MINIMUM among
all edges touching either endpoint joins the matching (two such edges can
never share a vertex — the shared vertex would give one of them a
non-minimal priority), then both endpoints leave the graph.  The global
minimum edge is always locally minimal, so every round makes progress,
and with hash-random priorities a constant fraction of edges drops per
round (O(log E) rounds in practice — the Luby argument applied to the
line graph WITHOUT materializing it).

Each round is one vertex-min groupBy (map-side combinable) + two
equi-joins + two anti-joins; never a pair set, lineage truncated per
round.  Priorities are zero-padded strings of (hash, a, b), totally
ordered and engine-portable, so the result is a pure function of the
data — reproducible across partitionings and mirrorable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.datapipe.sketch import _stage2


def _priority(round_no: int):
    h = _stage2(
        F.concat_ws(
            "\x1f",
            F.col("a").cast("string"),
            F.col("b").cast("string"),
            F.lit(str(round_no)),
        ),
        31,
        1009,
    )
    return F.format_string(
        "%010d|%s|%s", h, F.col("a").cast("string"), F.col("b").cast("string")
    )


def maximal_matching(edges: DataFrame, max_rounds: int = 60) -> DataFrame:
    """Matched edges ``(a, b)`` with ``a < b`` forming a maximal matching
    of the undirected graph (self-loops dropped, parallel edges
    collapsed).  Deterministic: the result depends only on the edge
    set."""
    live = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    matched = live.filter(F.lit(False))

    for r in range(max_rounds):
        if not live.limit(1).count():
            return matched
        pe = live.withColumn("_p", _priority(r))
        vmin = (
            pe.select(F.col("a").alias("v"), "_p")
            .unionByName(pe.select(F.col("b").alias("v"), "_p"))
            .groupBy("v")
            .agg(F.min("_p").alias("_vm"))
        )
        sel = (
            pe.join(
                vmin.select(F.col("v").alias("_va"), F.col("_vm").alias("_ma")),
                pe["a"] == F.col("_va"),
            )
            .join(
                vmin.select(F.col("v").alias("_vb"), F.col("_vm").alias("_mb")),
                pe["b"] == F.col("_vb"),
            )
            .filter((F.col("_p") == F.col("_ma")) & (F.col("_p") == F.col("_mb")))
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        matched = matched.unionByName(sel).localCheckpoint(eager=True)
        used = sel.select(F.col("a").alias("v")).unionByName(
            sel.select(F.col("b").alias("v"))
        )
        live = (
            live.join(used.select(F.col("v").alias("a")), "a", "left_anti")
            .join(used.select(F.col("v").alias("b")), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    raise ValueError(f"matching did not converge in {max_rounds} rounds")
