"""Point-in-time (as-of) join — the time-series join Spark has no native
operator for.

For every left row, attach the nearest right row at-or-before its
timestamp (``backward``, the trades⋈quotes / price-lookup semantics) or
at-or-after it (``forward``), optionally bounded by a tolerance.  Equal
timestamps match.

Scale shape: NO join at all — the classic union + keyed-window trick.
Both streams are tagged and unioned (the left payload rides along as one
struct column, NULL on right rows), ONE shuffle co-partitions them by
key, and a window partitioned by key ordered by (ts, side) carries the
most recent right-side payload forward with ``last(ignoreNulls)``.  A
key's cost is its own history; hot keys never fan out (contrast with the
naive range join, whose worst case is |left_key| × |right_key| pairs).
The window frame is bounded per key — never a global window.

Right-side ties (same key and timestamp) are collapsed BEFORE the union
by the greatest value-struct (field-order lexicographic max) so the
result is deterministic on any partitioning — the same contract DuckDB's
``max(ROW(...))`` mirrors exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
    matched_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``<matched_prefix>ts`` and
    ``<matched_prefix><col>`` for each of the right side's ``value_cols``
    (all NULL when no right row qualifies).

    ``ts_col`` must be numeric on both sides (epoch seconds/days — cast
    upstream) and is matched per ``key_col``; ``direction`` is
    ``backward`` (right.ts <= left.ts, nearest wins) or ``forward``
    (right.ts >= left.ts).  With ``tolerance`` t, matches farther than t
    time units are nulled out.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be >= 0")
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    r = (
        right.select(
            F.col(key_col).alias("_k"),
            F.col(ts_col).cast("bigint").alias("_t"),
            F.struct(*[F.col(c) for c in value_cols]).alias("_v"),
        )
        .groupBy("_k", "_t")
        .agg(F.max("_v").alias("_v"))
    )
    payload_t = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).cast("bigint").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_v"].dataType).alias("_v"),
        payload_t.alias("_payload"),
    )
    rr = r.select(
        "_k",
        "_t",
        F.lit(0).alias("_side"),
        "_v",
        F.lit(None).cast(l.schema["_payload"].dataType).alias("_payload"),
    )
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").asc()]
    else:
        order = [F.col("_t").desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        rr.unionByName(l)
        .withColumn("_mv", F.last("_v", ignorenulls=True).over(w))
        .withColumn(
            "_mt",
            F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True)
            .over(w),
        )
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        gap = (
            F.col("_t") - F.col("_mt")
            if direction == "backward"
            else F.col("_mt") - F.col("_t")
        )
        ok = F.col("_mt").isNotNull() & (gap <= tolerance)
        carried = carried.withColumn(
            "_mv", F.when(ok, F.col("_mv"))
        ).withColumn("_mt", F.when(ok, F.col("_mt")))
    sel = [F.col("_payload").getField(c).alias(c) for c in left.columns]
    sel.append(F.col("_mt").alias(matched_prefix + "ts"))
    sel.extend(
        F.col("_mv").getField(c).alias(matched_prefix + c) for c in value_cols
    )
    return carried.select(*sel)
