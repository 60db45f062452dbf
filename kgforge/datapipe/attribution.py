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


def shapley_attribution(
    touches: DataFrame,
    user_col: str,
    channel_col: str,
    conv_col: str,
    channels: list[str],
) -> DataFrame:
    """Data-driven Shapley channel attribution (Shapley 1953 applied to
    marketing coalitions à la Zhao et al. 2018): the characteristic
    function v(S) is the observed conversion count of users whose
    touched-channel set is exactly S (unobserved coalitions contribute
    0), and each channel's credit is

        φ_i = Σ_{T ∋ i} w(|T|−1)·v(T) − Σ_{T ∌ i} w(|T|)·v(T),
        w(s) = s!·(n−1−s)!/n!

    EXACT arithmetic: weights are kept as the integer numerators
    s!·(n−1−s)! and φ is accumulated over the common denominator n!,
    so ``phi_num`` is an exact integer (``phi_micro`` divides once at
    the end).  Efficiency holds exactly:
    Σ_i phi_num_i = n!·(v(all channels) − v(∅)) — asserted in tests.

    Scale shape: one combinable per-user aggregation, then everything
    operates on DISTINCT COALITIONS (≤ 2ⁿ rows — channel vocabularies
    are small by construction); the member/non-member expansion is
    coalition-sized, and the final per-channel sum is n rows.  The
    channel universe must be given explicitly (it fixes n and the
    weights at plan time — no driver collect)."""
    import math

    n = len(channels)
    if n < 1 or len(set(channels)) != n:
        raise ValueError("channels must be a non-empty list of distinct names")
    if n > 20:
        raise ValueError("Shapley over >20 channels: n! exceeds int64")
    w = [math.factorial(s) * math.factorial(n - 1 - s) for s in range(n)]
    nfact = math.factorial(n)

    per_user = (
        touches.groupBy(F.col(user_col).alias("u"))
        .agg(
            F.sort_array(F.collect_set(F.col(channel_col))).alias("chans"),
            F.max(F.col(conv_col)).cast("bigint").alias("conv"),
        )
    )
    coal = per_user.groupBy("chans").agg(
        F.sum("conv").cast("bigint").alias("v"))

    w_member = (
        "CASE size(chans) "
        + " ".join(f"WHEN {s + 1} THEN {w[s]}L" for s in range(n))
        + " ELSE 0L END"
    )
    w_non = (
        "CASE size(chans) "
        + " ".join(f"WHEN {s} THEN {w[s]}L" for s in range(n))
        + " ELSE 0L END"
    )
    mem = (
        coal.filter(F.size("chans") > 0)
        .select(
            F.explode("chans").alias("channel"),
            (F.col("v") * F.expr(w_member)).cast("bigint").alias("d"),
        )
    )
    univ = touches.sparkSession.createDataFrame(
        [(c,) for c in channels], "channel string")
    non = (
        coal.crossJoin(F.broadcast(univ))
        .filter(~F.array_contains("chans", F.col("channel")))
        .select(
            "channel",
            (-F.col("v") * F.expr(w_non)).cast("bigint").alias("d"),
        )
    )
    return (
        mem.unionByName(non)
        .groupBy("channel")
        .agg(F.sum("d").cast("bigint").alias("phi_num"))
        .select(
            "channel",
            "phi_num",
            F.expr(f"(phi_num * 1000000) div {nfact}").cast("bigint")
            .alias("phi_micro"),
        )
    )
