"""Event-stream session analytics: sessionization, funnel conversion,
retention cohorts.

The batch complement of ``kgforge.streaming.stream_sessionize`` — the three
shapes every product-analytics pipeline derives from a raw event log
(reference scope: the event/usage tables the anonymization service's KPI
layer summarizes; here generalized to the standard analytics trio).

Scale shape: every operator is keyed by the user column — ONE shuffle
brings a user's events together, windows are partitioned by user (a task
holds one user's history, never the corpus), and the outputs are
per-session / per-step / per-cohort aggregates that shrink monotonically.
No self-joins, no pair sets, no global windows; hot users cost their own
history and nothing else.  All scoring arithmetic is integer (epoch
seconds/days in, counts and integer durations out); the only floats are
final ratios, computed once and rounded to 6 places so results are
bit-stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Split each user's event stream into sessions at inactivity gaps:
    a new session starts when the time since the previous event exceeds
    ``gap`` (same units as ``ts_col``, which must be numeric — epoch
    seconds/days; cast upstream).

    Output: one row per session ``(user, session_idx, start_ts, end_ts,
    n_events, duration)`` with ``session_idx`` 1-based in time order and
    ``duration = end_ts - start_ts`` (0 for single-event sessions).

    Equal timestamps order arbitrarily between themselves, but a zero
    delta can never open a session, so session boundaries — and therefore
    every output value — depend only on the sorted multiset of
    timestamps: the result is partition- and tie-order-invariant.
    """
    if gap < 1:
        raise ValueError("gap must be >= 1")
    w = Window.partitionBy("user").orderBy("ts")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).cast("bigint").alias("ts"),
    )
    flagged = ev.withColumn(
        "_new",
        F.when(
            F.col("ts") - F.lag("ts").over(w) > F.lit(gap), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        # first event per user: lag is NULL -> _new 0; +1 below makes it
        # session 1, so the running sum never needs a null branch
        "session_idx",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint")
        + 1,
    )
    return flagged.groupBy("user", "session_idx").agg(
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("ts") - F.min("ts")).alias("duration"),
    )


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel conversion: how many users complete step 1, then
    step 2 AFTER their step-1 match, then step 3 after that, … (greedy
    first-occurrence sequencing — the standard funnel semantics: each
    step matches the earliest qualifying event after the previous match).

    Output: one row per funnel step ``(step_idx, step_name, n_reached,
    frac_of_entered, frac_of_prev)`` — ``step_idx`` 1-based, fractions
    rounded to 6 (NULL when the denominator is 0).  Every step appears
    even when no user reaches it.

    Scale: events not naming a funnel step are filtered BEFORE the
    shuffle; each user's qualifying events fold left in timestamp order
    (ties broken by step index — the funnel-friendliest deterministic
    order) with an integer depth accumulator, so per-task memory is one
    user's funnel events.  The summary join runs over ≤ len(steps)+1
    rows on both sides.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct")
    idx_map = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    ev = (
        events.select(
            F.col(user_col).alias("user"),
            F.col(ts_col).cast("bigint").alias("ts"),
            F.col(type_col).alias("etype"),
        )
        .filter(F.col("etype").isin(*steps))
        .select("user", "ts", idx_map[F.col("etype")].alias("idx"))
    )
    per_user = ev.groupBy("user").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("ts"), F.col("idx")))
        ).alias("_evs")
    )
    # greedy fold: depth advances when the event's step index equals the
    # current depth.  String accumulator (see timeseries.holt_linear on why:
    # portable fold runtimes require acc type == element type)
    fold = (
        "aggregate(transform(_evs, e -> cast(e.idx as string)), '0',"
        " (acc, x) -> IF(cast(x as int) = cast(acc as int),"
        "               cast(cast(acc as int) + 1 as string), acc))"
    )
    depths = per_user.select(
        F.expr(fold).cast("bigint").alias("depth")
    )
    hist = depths.groupBy("depth").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # n_reached(step i) = users with depth >= i.  hist has at most
    # len(steps)+1 rows, so the >= join is a broadcast nested loop over
    # O(k^2) constant-bounded pairs — NOT a data-sized cartesian.
    spine = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step_idx long, step_name string",
    )
    joined = (
        spine.join(
            F.broadcast(hist), F.col("depth") >= F.col("step_idx"), "left"
        )
        .groupBy("step_idx", "step_name")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_reached"))
    )
    ws = Window.orderBy("step_idx")
    entered = F.first("n_reached").over(
        ws.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    prev = F.lag("n_reached").over(ws)
    return joined.select(
        "step_idx",
        "step_name",
        "n_reached",
        F.when(
            entered > 0,
            F.round(F.col("n_reached").cast("double") / entered, 6),
        ).alias("frac_of_entered"),
        F.when(
            F.coalesce(prev, entered) > 0,
            F.round(
                F.col("n_reached").cast("double") / F.coalesce(prev, entered), 6
            ),
        ).alias("frac_of_prev"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period: int,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of their
    first activity (``period`` in ``ts_col`` units — e.g. 7 with epoch
    days for weekly cohorts), and each ``(cohort, offset)`` cell counts
    how many of that cohort's users were active ``offset`` periods later.

    Output: ``(cohort, offset, n_active, cohort_size, retention)`` with
    ``retention = n_active / cohort_size`` rounded to 6; the ``offset`` 0
    row is the cohort definition itself (retention 1.0).  Periods are
    ``ts div period`` — Java truncating division, so keep timestamps
    non-negative for calendar-aligned cohorts.

    Scale: one user-keyed aggregate (first period), one distinct over
    (user, period), one cohort-keyed count — all map-side combinable; the
    cohort-size join runs on the already-aggregated matrix.
    """
    if period < 1:
        raise ValueError("period must be >= 1")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.expr(f"cast({ts_col} as bigint) div {period}").alias("p"),
    )
    first = ev.groupBy("user").agg(F.min("p").alias("cohort"))
    active = ev.distinct().join(first, "user")
    cells = (
        active.select("cohort", (F.col("p") - F.col("cohort")).alias("offset"), "user")
        .distinct()
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    sizes = cells.filter(F.col("offset") == 0).select(
        "cohort", F.col("n_active").alias("cohort_size")
    )
    return cells.join(sizes, "cohort").select(
        "cohort",
        "offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )
