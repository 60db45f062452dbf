"""SCD type-2 dimension build: change events → validity intervals.

Given a stream of per-key observations (snapshots, CDC events, order
facts), emit one row per STATE with ``valid_from`` / ``valid_to``
half-open intervals: consecutive observations with unchanged tracked
attributes collapse into one interval, and the current state carries a
null ``valid_to`` — the standard slowly-changing-dimension type 2 shape
(Kimball) every warehouse backfill needs.

Scale shape: two windows partitioned by the dimension key (never a
single-partition window — per-key history is the natural unit of work)
plus one filter; map-side no shuffles beyond the one hash exchange on
the key that both windows share (same partitioning, planned as a single
exchange)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """(key, *attrs, valid_from, valid_to) intervals per key.

    Observations are ordered by ``(ts, *tiebreak_cols)``; rows whose
    tracked attributes equal the previous observation's are collapsed
    into the open interval.  ``valid_to`` is the NEXT state's
    ``valid_from`` (half-open; null for the current state).  Supply
    ``tiebreak_cols`` whenever ``(key, ts)`` is not unique — the state
    sequence is only well-defined under a total per-key order."""
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    order = [F.col(ts_col)] + [
        F.col(c) for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    # eqNullSafe: attrs may be null, and the first row's lag IS null —
    # both must read as "changed", which plain != gets wrong (null)
    changed = ~F.lag(state).over(w).eqNullSafe(state)
    ch = df.withColumn("_chg", changed).filter(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return ch.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    )
