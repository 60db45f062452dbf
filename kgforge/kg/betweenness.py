"""Betweenness centrality (Brandes) from a landmark source set.

Brandes 2001 ("A faster algorithm for betweenness centrality") organizes
betweenness as one BFS DAG per source: a forward pass counts shortest
paths (``sigma``, an integer), a backward pass accumulates dependencies

    delta(v) = Σ_{w : succ of v in the DAG}  sigma(v)/sigma(w) · (1 + delta(w))

and a vertex's centrality is the sum of its deltas over sources.  Exact
all-sources betweenness is O(V·E) — not a 100-TB operation — so this
implements the standard landmark approximation: the caller passes a
source sample (plus ``max_depth`` to bound the DAGs), and ALL sources
advance together per level, exactly like
:func:`kgforge.kg.paths.pairwise_distances` — diameter-many rounds total,
not diameter×|S|.

Determinism discipline (the whole point of this formulation):

- ``sigma`` is a pure integer groupBy sum — partition-order exact.
- Each ``delta`` is a fold over the node's successor list SORTED by
  successor id, and the final per-node centrality is a fold over
  (source, delta) SORTED by source — float additions happen in one
  defined order, so the result is reproducible bit-for-bit across
  partitionings and engines (the DuckDB oracle mirrors the same sorted
  folds).
- Levels are materialized with ``localCheckpoint`` (bounded by
  ``max_depth``), the house pattern for iterated graph plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def betweenness(
    edges: DataFrame,
    sources,
    directed: bool = False,
    max_depth: int = 8,
) -> DataFrame:
    """(node, bc): depth-bounded Brandes betweenness from ``sources``.

    ``max_depth`` truncates every BFS DAG (paths longer than it do not
    contribute — the documented k-bounded variant; set it above the graph
    diameter for exact landmark betweenness).  For ``directed=False``
    each unordered pair is seen from both endpoints when both are
    sources, so the conventional /2 normalization is applied."""
    spark = edges.sparkSession
    e = edges.select(
        F.col("src").cast("string"), F.col("dst").cast("string")
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().persist()

    if isinstance(sources, DataFrame):
        src = sources.select(
            F.col(sources.columns[0]).cast("string").alias("source")
        ).distinct()
    else:
        src = spark.createDataFrame(
            [(str(s),) for s in sources], "source string"
        ).distinct()

    lvl0 = src.select(
        "source",
        F.col("source").alias("node"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint(eager=True)
    levels = [lvl0]
    settled = lvl0.select("source", "node").localCheckpoint(eager=True)
    for _ in range(max_depth):
        prev = levels[-1]
        nxt = (
            prev.join(e, prev["node"] == e["src"])
            .select("source", F.col("dst").alias("node"), "sigma")
            .groupBy("source", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .join(settled, ["source", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if not nxt.limit(1).count():
            break
        levels.append(nxt)
        settled = settled.unionByName(
            nxt.select("source", "node")
        ).localCheckpoint(eager=True)

    deltas: list = [None] * len(levels)
    deltas[-1] = levels[-1].select(
        "source", "node", F.lit(0.0).alias("delta")
    )
    for li in range(len(levels) - 2, -1, -1):
        wtab = (
            levels[li + 1]
            .join(deltas[li + 1], ["source", "node"])
            .select(
                "source",
                F.col("node").alias("w"),
                F.col("sigma").alias("sw"),
                F.col("delta").alias("dw"),
            )
        )
        v = levels[li]
        succ = (
            v.join(e, v["node"] == e["src"])
            .select("source", "node", "sigma", F.col("dst").alias("w"))
            .join(wtab, ["source", "w"])
            .groupBy("source", "node", "sigma")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("w", "sw", "dw"))
                ).alias("_succ")
            )
            .select(
                "source",
                "node",
                F.aggregate(
                    "_succ",
                    F.lit(0.0),
                    lambda acc, x: acc
                    + (F.col("sigma") / x["sw"]) * (F.lit(1.0) + x["dw"]),
                ).alias("delta"),
            )
        )
        deltas[li] = (
            v.select("source", "node")
            .join(succ, ["source", "node"], "left")
            .select(
                "source", "node", F.coalesce("delta", F.lit(0.0)).alias("delta")
            )
            .localCheckpoint(eager=True)
        )

    all_nodes = settled.select("node").distinct()
    if len(levels) == 1:
        e.unpersist()
        return all_nodes.select("node", F.lit(0.0).alias("bc"))
    contrib = deltas[1]
    for d in deltas[2:]:
        contrib = contrib.unionByName(d)
    bc = (
        contrib.groupBy("node")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("source", "delta"))
            ).alias("_ds")
        )
        .select(
            "node",
            F.aggregate(
                "_ds", F.lit(0.0), lambda acc, x: acc + x["delta"]
            ).alias("bc"),
        )
    )
    # every node any BFS settled gets a row (sources that relay nothing: 0)
    bc = all_nodes.join(bc, "node", "left").select(
        "node", F.coalesce("bc", F.lit(0.0)).alias("bc")
    )
    if not directed:
        bc = bc.select("node", (F.col("bc") / 2.0).alias("bc"))
    out = bc.localCheckpoint(eager=True)
    e.unpersist()
    return out
