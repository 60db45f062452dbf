"""Golden-record survivorship: one canonical record per entity cluster.

The last stage of a master-data pipeline: after blocking
(:mod:`kgforge.datapipe.blocking`), scoring (Fellegi-Sunter) and
transitive merge (:mod:`kgforge.kg.components`) produce entity clusters,
survivorship picks each cluster's canonical field values under explicit
per-field rules — the MDM "golden record".

Every rule is a deterministic aggregate, so the whole operator is ONE
map-side-combinable groupBy over the cluster id: no window, no
self-join, no per-cluster driver work.  Rules:

* ``max`` / ``min`` — extreme value (nulls ignored);
* ``longest`` / ``shortest`` — by ``(length, value)`` so ties break on
  the value itself, never on row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RULES = ("max", "min", "longest", "shortest")


def golden_records(
    df: DataFrame,
    cluster_col: str,
    rules: list[tuple[str, str]],
) -> DataFrame:
    """One row per cluster: ``(cluster, n_members, <field per rule>)``.

    ``rules`` is ``[(column, rule), ...]`` with rule in ``max | min |
    longest | shortest``; each output column keeps its input name.  A
    cluster whose column is all-null survives as null."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_members")]
    for col, rule in rules:
        c = F.col(col)
        if rule == "max":
            aggs.append(F.max(c).alias(col))
        elif rule == "min":
            aggs.append(F.min(c).alias(col))
        elif rule in ("longest", "shortest"):
            # when(): a null value must contribute a NULL struct (skipped
            # by min/max) — a struct OF nulls would win `shortest`
            pick = F.when(
                c.isNotNull(),
                F.struct(
                    F.length(c.cast("string")).alias("_l"), c.alias("_v")
                ),
            )
            agg = F.max(pick) if rule == "longest" else F.min(pick)
            aggs.append(agg.getField("_v").alias(col))
        else:
            raise ValueError(f"unknown rule {rule!r} (use {_RULES})")
    return df.groupBy(F.col(cluster_col).alias("cluster")).agg(*aggs)
