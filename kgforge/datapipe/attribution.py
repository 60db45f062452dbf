"""Marketing-funnel touch attribution over an event stream.

For every conversion event, find the first and last qualifying touch
(view/click/any caller-chosen types) inside a lookback window — the
first-touch / last-touch attribution models every growth pipeline
computes, plus the touch count the fractional models (linear, U-shaped)
need as their denominator.

Scale shape: NO per-conversion join and NO pair set — touches and
conversions stay in ONE stream, and both models come from range-frame
windows partitioned by the user key and ordered by the numeric
timestamp (``RANGE BETWEEN lookback PRECEDING AND 1 PRECEDING``), so a
user's cost is their own history and hot users never fan out.  Touch
columns are null on non-touch rows; ``first/last(ignoreNulls)`` inside
the frame picks the attribution without materializing candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def touch_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    touch_types: list[str],
    conversion_type: str,
    lookback: int,
) -> DataFrame:
    """One row per conversion event: ``(user, conv_ts, first_touch_type,
    first_touch_ts, last_touch_type, last_touch_ts, n_touches)``.

    ``ts_col`` must be numeric (epoch seconds/days — cast upstream) and
    unique per user (tie order inside a range frame is otherwise
    engine-defined).  A touch qualifies when its timestamp lies in
    ``[conv_ts - lookback, conv_ts - 1]``; unattributed conversions keep
    nulls and ``n_touches`` 0."""
    if lookback < 1:
        raise ValueError("lookback must be >= 1")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    is_touch = F.col(type_col).isin(*touch_types)
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).cast("bigint").alias("ts"),
        F.col(type_col).alias("etype"),
        F.when(is_touch, F.col(type_col)).alias("_tt"),
        F.when(is_touch, F.col(ts_col).cast("bigint")).alias("_tts"),
    )
    w = (
        Window.partitionBy("user")
        .orderBy("ts")
        .rangeBetween(-lookback, -1)
    )
    scored = ev.select(
        "user",
        "ts",
        "etype",
        F.first("_tt", ignorenulls=True).over(w).alias("first_touch_type"),
        F.first("_tts", ignorenulls=True).over(w).alias("first_touch_ts"),
        F.last("_tt", ignorenulls=True).over(w).alias("last_touch_type"),
        F.last("_tts", ignorenulls=True).over(w).alias("last_touch_ts"),
        F.count("_tts").over(w).alias("n_touches"),
    )
    return scored.filter(F.col("etype") == conversion_type).select(
        "user",
        F.col("ts").alias("conv_ts"),
        "first_touch_type",
        "first_touch_ts",
        "last_touch_type",
        "last_touch_ts",
        "n_touches",
    )
