"""Time-series regularization: dense-grid gap fill + forward fill.

Sensor feeds, daily aggregates, and SCD snapshots arrive with holes; a
downstream join or window expects one row per (key, tick).  ``fill_gaps``
densifies each key's integer time axis from its first to its last
observation (fixed ``step``) and carries the last observed value forward
into the synthesized ticks — the standard ``resample().ffill()`` shape,
expressed distributively.

Scale shape: the grid is built per key with ``sequence`` + ``explode``
(distributed — each key's span explodes inside its own tasks, no driver
loop), the join back to observations is a per-key equi-join, and the
forward fill is ONE window partitioned by key (``last(ignoreNulls)``),
never a global window.  Grid size is span/step rows per key — the caller
controls the blowup by choosing the tick unit (document a day-grid, not
a millisecond-grid).  Skew: a single key's grid is proportional to its
span, not to the corpus, so hot keys cost what their history costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    step: int = 1,
) -> DataFrame:
    """One row per (key, tick) on each key's [min(ts), max(ts)] grid.

    ``ts_col`` must be integral (epoch days/hours — convert upstream).
    Output carries ``is_observed`` plus, per value column, the forward-
    filled value (observed rows keep their own).  Rows before a key's
    first observation cannot exist (the grid starts at min(ts)).
    (key, ts) must be unique — pre-aggregate duplicates upstream, a
    duplicated tick would duplicate its grid row — and with
    ``step > 1`` every observation must sit ON the grid
    (ts ≡ min(ts) mod step), or the grid join cannot reach it and it is
    silently skipped.
    """
    if step < 1:
        raise ValueError("step must be >= 1")
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    spans = df.groupBy(key_col).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
        ).alias(ts_col),
    )
    joined = grid.join(
        df.withColumn("_obs", F.lit(True)), [key_col, ts_col], "left"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c)
        for c in value_cols
    ]
    return joined.select(
        key_col,
        ts_col,
        F.coalesce(F.col("_obs"), F.lit(False)).alias("is_observed"),
        *filled,
    )


def acf_by_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-key lag-k autocorrelation of an ordered series — the standard
    "is this metric mean-reverting / trending / noise" probe for anomaly
    baselining:

        r_k = Σ_{t≤n−k} (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²

    To stay integer-exact across engines and partitionings the mean is
    never divided out: with n the key's length and S its sum, the centered
    term is ``d_t = x_t·n − S`` (a bigint), and the n² scaling cancels in
    the ratio.  Only the final num/den division is float (rounded to 6).
    Constant series (den = 0) yield NULL.

    Scale: one window exchange per key (partition aggregates + max_lag
    leads in the same ordered window), then a map-side-combinable groupBy
    — per-task state is the key's own history, never the corpus.  Lags
    index OBSERVATIONS in ``ts_col`` order (densify with ``fill_gaps``
    upstream if calendar lags are wanted)."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    part = Window.partitionBy(key_col)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    x = F.col(value_col).cast("long")
    n = F.count(F.lit(1)).over(part).cast("bigint")
    s = F.sum(x).over(part).cast("bigint")
    d = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_t"),
        (x * n - s).alias("_d"),
    )
    leads = d.select(
        "key",
        "_d",
        *[F.lead("_d", k).over(
            Window.partitionBy("key").orderBy("_t")
        ).alias(f"_d{k}") for k in range(1, max_lag + 1)],
    )
    aggs = [F.sum(F.col("_d") * F.col("_d")).cast("bigint").alias("_den")]
    for k in range(1, max_lag + 1):
        aggs.append(
            F.sum(F.col("_d") * F.col(f"_d{k}")).cast("bigint").alias(f"_num{k}")
        )
        aggs.append(F.count(F.col(f"_d{k}")).cast("bigint").alias(f"_np{k}"))
    g = leads.groupBy("key").agg(*aggs)
    lagged = g.select(
        "key",
        "_den",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col(f"_num{k}").alias("_num"),
                        F.col(f"_np{k}").alias("n_pairs"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("_l"),
    )
    return lagged.select(
        "key",
        F.col("_l.lag").alias("lag"),
        F.col("_l.n_pairs").alias("n_pairs"),
        F.when(
            F.col("_den") != 0,
            F.round(F.col("_l._num").cast("double") / F.col("_den"), 6),
        ).alias("acf"),
    )


def theil_sen_slope(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Per-key Theil–Sen trend estimate: the MEDIAN of all pairwise slopes
    ``(x_j − x_i)/(t_j − t_i)`` over ``t_i < t_j`` — the robust twin of the
    OLS trend (breakdown point ~29%, immune to the outlier days that drag
    a least-squares fit).

    Median convention: average of the two middle order statistics (equal
    for odd counts) — sorting and averaging identical IEEE doubles is
    engine-exact; the result is rounded to 6.

    Scale: the pair set is a per-key self-equi-join, O(m²) in the KEY'S
    OWN tick count m (a daily series costs days², never corpus²) — the
    caller controls m by the tick unit, same contract as ``fill_gaps``.
    The median is one ordered window per key over those pairs.  Keys with
    a single observation have no pairs and are absent."""
    a = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_t1"),
        F.col(value_col).alias("_x1"),
    )
    b = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_t2"),
        F.col(value_col).alias("_x2"),
    )
    pairs = a.join(b, "key").filter(F.col("_t2") > F.col("_t1"))
    slopes = pairs.select(
        "key",
        (
            (F.col("_x2") - F.col("_x1")).cast("double")
            / (F.col("_t2") - F.col("_t1"))
        ).alias("_slope"),
    )
    w = Window.partitionBy("key").orderBy("_slope")
    part = Window.partitionBy("key")
    ranked = slopes.select(
        "key",
        "_slope",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(part).cast("bigint").alias("_np"),
    )
    mid = ranked.filter(
        (F.col("_rn") == F.floor((F.col("_np") + 1) / 2))
        | (F.col("_rn") == F.floor((F.col("_np") + 2) / 2))
    )
    return mid.groupBy("key").agg(
        F.max("_np").alias("n_pairs"),
        F.round(F.avg("_slope"), 6).alias("slope"),
    )


def seasonal_dow_index(
    df: DataFrame, key_col: str, day_col: str, value_col: str
) -> DataFrame:
    """Per-key day-of-week seasonal index: mean(value | weekday) divided by
    the key's overall mean — the multiplicative seasonality profile behind
    "weekends run at 40% of weekday volume" adjustments.  ``day_col`` is
    integral epoch days; weekday = ``(day + 4) mod 7`` (0 = Monday, epoch
    day 0 was a Thursday).

    Integer-exact: index = (s_d·N) / (n_d·S) with per-weekday sum/count
    (s_d, n_d) and per-key totals (S, N) — one float division at the end,
    rounded to 6.

    Scale: two map-side-combinable groupBys and a per-key equi-join of a
    ≤7-row-per-key table — AQE broadcasts the totals side."""
    x = F.col(value_col).cast("long")
    dow = ((F.col(day_col) + 4) % 7).cast("int")
    per = (
        df.select(F.col(key_col).alias("key"), dow.alias("dow"), x.alias("_x"))
        .groupBy("key", "dow")
        .agg(
            F.sum("_x").cast("bigint").alias("_sd"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
    )
    tot = per.groupBy("key").agg(
        F.sum("_sd").cast("bigint").alias("_s"),
        F.sum("n_days").cast("bigint").alias("_n"),
    )
    return per.join(tot, "key").select(
        "key",
        "dow",
        "n_days",
        F.round(
            (F.col("_sd") * F.col("_n")).cast("double")
            / (F.col("n_days") * F.col("_s")),
            6,
        ).alias("seasonal_index"),
    )


def ewma_halflife(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Per-key exponentially weighted moving average with α = 1/2 over the
    key's ticks in ``ts_col`` order, in INTEGER units:

        s_1 = x_1          s_t = (s_{t−1} + x_t) div 2

    — the α=1/2 EWMA with truncating division as the only rounding, so the
    recursion is bit-identical on any engine and any partitioning (the
    same fixed-point discipline as SimRank/TextRank).  α=1/2 makes each
    observation lose half its weight per tick — the "what is this metric
    at, smoothed over the recent past" tracker for alerting baselines.

    Output: ``(key, n_ticks, last_value, ewma)``.

    Scale: ONE groupBy collecting each key's own (tick, value) list —
    per-task memory is the key's history (same contract as fill_gaps /
    acf; keys with unbounded history need a windowed variant upstream) —
    then a JVM left-fold over the sorted array.  No Python, no shuffle
    beyond the single grouped exchange."""
    g = (
        df.select(
            F.col(key_col).alias("key"),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(value_col).cast("bigint").alias("x"),
            ).alias("_p"),
        )
        .groupBy("key")
        .agg(F.sort_array(F.collect_list("_p")).alias("_ps"))
    )
    return g.select(
        "key",
        F.size("_ps").cast("bigint").alias("n_ticks"),
        F.element_at("_ps", -1)["x"].alias("last_value"),
        F.expr(
            "aggregate(slice(transform(_ps, p -> p.x), 2, size(_ps)),"
            " _ps[0].x, (acc, x) -> (acc + x) div 2)"
        ).alias("ewma"),
    )


def kaplan_meier(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Kaplan-Meier survival curve with right censoring — the standard
    "how long do users/sessions/documents survive" estimator:

        S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

    over distinct EVENT times t_i (``event_col`` = 1 observed, 0 censored
    — censored subjects leave the risk set but contribute no factor).
    The risk set n_i is everyone with duration ≥ t_i.  The product is a
    cumulative sum of ln factors over the time-ordered rows — both
    engines accumulate in the SAME (time) order, so the only divergence
    is ln/exp last-ulp, absorbed by the final round to 6.

    Output: one row per distinct event time —
    ``(t, n_risk, n_events, n_censored, survival)``.

    Scale: one groupBy per distinct duration, one ordered window over the
    (small) distinct-time table for the cumulative risk set and the
    cumulative ln-sum — the raw data is scanned once."""
    d = df.select(
        F.col(duration_col).cast("bigint").alias("t"),
        F.col(event_col).cast("int").alias("e"),
    )
    per = d.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("_m"),
        F.sum("e").cast("bigint").alias("n_events"),
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = per.agg(F.sum("_m").cast("bigint").alias("_n"))
    cum = per.crossJoin(F.broadcast(total)).withColumn(
        "_ended", F.sum("_m").over(w).cast("bigint")
    )
    cum = cum.withColumn(
        "n_risk", F.col("_n") - F.col("_ended") + F.col("_m")
    )
    # Spark's ln(0) is NULL (and sum skips NULLs), so the zero factor at a
    # time where the whole risk set dies is tracked separately: once any
    # factor is 0, the curve is 0 forever.
    lnf = F.when(
        (F.col("n_events") > 0) & (F.col("n_risk") > F.col("n_events")),
        F.log(
            (F.col("n_risk") - F.col("n_events")).cast("double")
            / F.col("n_risk")
        ),
    ).otherwise(F.lit(0.0))
    zf = F.when(
        (F.col("n_events") > 0) & (F.col("n_risk") == F.col("n_events")), 1
    ).otherwise(0)
    curve = cum.withColumn("_lnS", F.sum(lnf).over(w)).withColumn(
        "_z", F.sum(zf).over(w)
    )
    return (
        curve.filter(F.col("n_events") > 0)
        .select(
            "t",
            "n_risk",
            "n_events",
            (F.col("_m") - F.col("n_events")).cast("bigint").alias(
                "n_censored"
            ),
            F.when(F.col("_z") > 0, F.lit(0.0))
            .otherwise(F.round(F.exp("_lnS"), 6))
            .alias("survival"),
        )
    )


def holt_linear(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + trend), α = β = 1/2,
    in INTEGER units with truncating division as the only rounding:

        l_1 = x_1                  b_1 = 0
        l_t = (x_t + l_{t−1} + b_{t−1}) div 2
        b_t = (b_{t−1} + (l_t − l_{t−1})) div 2

    — the trend-aware sibling of :func:`ewma_halflife`: where EWMA lags a
    ramping series by a constant offset, Holt's trend term closes the gap,
    so ``forecast = level + trend`` is the standard one-tick-ahead
    projection for capacity planning and alert baselines.  Truncating
    ``div`` (Java semantics — verified identical in Spark ``div`` and
    DuckDB ``//``, negatives included) makes the recursion bit-identical
    on any engine and any partitioning.

    Output: ``(key, n_ticks, level, trend, forecast)``.

    Scale: ONE groupBy collecting each key's own (tick, value) history —
    per-task memory is the key's history, the same contract as
    :func:`ewma_halflife` — then a JVM left-fold over the sorted array.
    The (level, trend) pair rides through the fold as a ``'l:b'`` string
    accumulator: portable fold runtimes require accumulator type ==
    element type, and a decimal string is the one encoding with no range
    ceiling (a bit-packed int64 would silently wrap on large levels).
    No Python, no shuffle beyond the single grouped exchange."""
    g = (
        df.select(
            F.col(key_col).alias("key"),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(value_col).cast("bigint").alias("x"),
            ).alias("_p"),
        )
        .groupBy("key")
        .agg(F.sort_array(F.collect_list("_p")).alias("_ps"))
    )
    # l = split(acc)[0], b = split(acc)[1]; l2 first, then b2 from l2
    step = (
        "concat("
        " cast((x + cast(split(acc, ':')[0] as bigint)"
        "         + cast(split(acc, ':')[1] as bigint)) div 2 as string),"
        " ':',"
        " cast((cast(split(acc, ':')[1] as bigint)"
        "       + ((x + cast(split(acc, ':')[0] as bigint)"
        "             + cast(split(acc, ':')[1] as bigint)) div 2"
        "          - cast(split(acc, ':')[0] as bigint))) div 2 as string))"
    )
    fold = (
        "aggregate(slice(transform(_ps, p -> p.x), 2, size(_ps)),"
        f" concat(cast(_ps[0].x as string), ':0'), (acc, x) -> {step})"
    )
    out = g.select(
        "key",
        F.size("_ps").cast("bigint").alias("n_ticks"),
        F.expr(fold).alias("_lb"),
    )
    level = F.split("_lb", ":").getItem(0).cast("bigint")
    trend = F.split("_lb", ":").getItem(1).cast("bigint")
    return out.select(
        "key",
        "n_ticks",
        level.alias("level"),
        trend.alias("trend"),
        (level + trend).alias("forecast"),
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: int = 7,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each observation is scored
    against the mean/stddev of its own trailing ``window`` observations
    (the current row EXCLUDED — a spike must not mask itself), the
    standard streaming-metrics anomaly gate.

    ``value_col`` must be integral (scale to cents/micro-units upstream):
    the trailing frame contributes only integer moments (n, Σx, Σx²), and

        z = (x·n − Σx) / sqrt(n·Σx² − (Σx)²)          [population σ]

    is ONE float expression over integer inputs, so ``round(z, 6)`` is
    bit-stable across engines and partitionings.  Rows with fewer than 2
    trailing observations or zero trailing variance get a NULL z (a
    constant history makes any deviation infinitely surprising — that is
    a data-quality signal, not an anomaly score).

    Output: ``(key, ts, value, n_prev, z, is_anomaly)`` with
    ``is_anomaly = |z| ≥ threshold`` (on the rounded z, so the flag is as
    portable as the score).

    Scale: ONE window partitioned by key ordered by tick with a bounded
    ROWS frame — no global window, no self-join; each key's frame state
    is O(window)."""
    w = Window.partitionBy("key").orderBy("ts").rowsBetween(-window, -1)
    d = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("bigint").alias("value"),
        )
        .withColumn("n_prev", F.count("value").over(w).cast("bigint"))
        .withColumn("_s", F.sum("value").over(w))
        .withColumn("_q", F.sum(F.col("value") * F.col("value")).over(w))
    )
    rad = F.col("n_prev") * F.col("_q") - F.col("_s") * F.col("_s")
    z = F.round(
        (F.col("value") * F.col("n_prev") - F.col("_s")).cast("double")
        / F.sqrt(rad.cast("double")),
        6,
    )
    return (
        d.withColumn(
            "z", F.when((F.col("n_prev") >= 2) & (rad > 0), z)
        )
        .withColumn(
            "is_anomaly",
            F.when(F.col("z").isNotNull(), F.abs(F.col("z")) >= threshold),
        )
        .drop("_s", "_q")
    )


def activity_streaks(df: DataFrame, key_col: str, day_col: str) -> DataFrame:
    """Per-key consecutive-day activity streaks (gaps-and-islands): distinct
    active days collapse into maximal runs of consecutive days, and each
    key reports how many runs it has, its longest run, and the length of
    its most recent run — the retention/engagement shape ("7-day streak")
    every activity dashboard wants.

    ``day_col`` must be integral epoch days (convert upstream).  The
    island id is the classic ``day − row_number()`` trick over the key's
    distinct days: consecutive days share it, any gap shifts it.  All
    outputs are exact integers.

    Output: ``(key, n_active_days, n_streaks, longest_streak,
    latest_streak, latest_streak_end)``.

    Scale: one dropDuplicates + one window partitioned by key + two
    grouped aggregations, all on the same key partitioning — Catalyst
    reuses the exchange; nothing is global."""
    w = Window.partitionBy("key").orderBy("day")
    runs = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(day_col).cast("bigint").alias("day"),
        )
        .dropDuplicates(["key", "day"])
        .withColumn(
            "_isl", F.col("day") - F.row_number().over(w).cast("bigint")
        )
        .groupBy("key", "_isl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_len"),
            F.max("day").alias("_end"),
        )
    )
    return runs.groupBy("key").agg(
        F.sum("_len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("_len").alias("longest_streak"),
        F.max_by("_len", "_end").alias("latest_streak"),
        F.max("_end").alias("latest_streak_end"),
    )


def forecast_backtest(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    horizon: int,
    season: int = 7,
) -> DataFrame:
    """Per-key forecast backtest: hold out each key's last ``horizon``
    ticks, forecast them with the three standard baselines — naive
    (last train value), seasonal naive (value one ``season`` back,
    recycled), and Holt linear (:func:`holt_linear`'s integer level +
    trend fold, projected ``i`` ticks ahead) — and score MAE and MASE
    (Hyndman & Koehler 2006: MAE scaled by the train-set seasonal-naive
    MAE, the scale-free accuracy measure that makes methods comparable
    across series).

    Keys with fewer than ``horizon + season + 1`` observations are
    dropped (not enough history to train and scale).  ``value_col`` must
    be integral: every error sum is an exact integer, and each reported
    score is ONE float division rounded to 6 — bit-stable across engines
    and partitionings.  MASE is NULL when the train seasonal differences
    are all zero (a constant series makes the scale degenerate).

    Output: ``(key, n_ticks, naive_mae, snaive_mae, holt_mae,
    naive_mase, snaive_mase, holt_mase)``.

    Scale: ONE groupBy collecting each key's own history (the
    :func:`ewma_halflife` contract), then pure JVM array folds."""
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    if season < 1:
        raise ValueError("season must be >= 1")
    h, s = horizon, season
    g = (
        df.select(
            F.col(key_col).alias("key"),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(value_col).cast("bigint").alias("x"),
            ).alias("_p"),
        )
        .groupBy("key")
        .agg(F.sort_array(F.collect_list("_p")).alias("_ps"))
        .select(
            "key", F.expr("transform(_ps, p -> p.x)").alias("xs")
        )
        .filter(F.size("xs") >= h + s + 1)
        .withColumn("n", F.size("xs").cast("bigint"))
        .withColumn("ntr", F.col("n") - h)
    )
    # integer sums of absolute errors over the holdout, per method
    sae_naive = (
        f"aggregate(transform(sequence(1, {h}),"
        f" i -> abs(element_at(xs, cast(ntr + i as int))"
        f"          - element_at(xs, cast(ntr as int)))),"
        f" cast(0 as bigint), (a, e) -> a + e)"
    )
    # seasonal naive: y[T+i] ~ y[T + i - s*ceil(i/s)]
    sae_snaive = (
        f"aggregate(transform(sequence(1, {h}),"
        f" i -> abs(element_at(xs, cast(ntr + i as int))"
        f"          - element_at(xs, cast(ntr + i - {s} * ((i + {s} - 1) div {s}) as int)))),"
        f" cast(0 as bigint), (a, e) -> a + e)"
    )
    # Holt level:trend fold over the train prefix (string accumulator —
    # see holt_linear), then |y[T+i] - (level + i*trend)|
    holt_step = (
        "concat("
        " cast((x + cast(split(acc, ':')[0] as bigint)"
        "         + cast(split(acc, ':')[1] as bigint)) div 2 as string),"
        " ':',"
        " cast((cast(split(acc, ':')[1] as bigint)"
        "       + ((x + cast(split(acc, ':')[0] as bigint)"
        "             + cast(split(acc, ':')[1] as bigint)) div 2"
        "          - cast(split(acc, ':')[0] as bigint))) div 2 as string))"
    )
    lb = (
        f"aggregate(slice(xs, 2, cast(ntr - 1 as int)),"
        f" concat(cast(xs[0] as string), ':0'), (acc, x) -> {holt_step})"
    )
    sae_holt = (
        f"aggregate(transform(sequence(1, {h}),"
        f" i -> abs(element_at(xs, cast(ntr + i as int))"
        f"          - (cast(split(_lb, ':')[0] as bigint)"
        f"             + i * cast(split(_lb, ':')[1] as bigint)))),"
        f" cast(0 as bigint), (a, e) -> a + e)"
    )
    # MASE scale: train seasonal-difference MAE numerator (integer)
    sdiff = (
        f"aggregate(transform(sequence({s} + 1, cast(ntr as int)),"
        f" t -> abs(element_at(xs, t) - element_at(xs, t - {s}))),"
        f" cast(0 as bigint), (a, e) -> a + e)"
    )
    scored = (
        g.withColumn("_lb", F.expr(lb))
        .withColumn("_sae_n", F.expr(sae_naive))
        .withColumn("_sae_s", F.expr(sae_snaive))
        .withColumn("_sae_h", F.expr(sae_holt))
        .withColumn("_sd", F.expr(sdiff))
    )

    def mae(c):
        return F.round(F.col(c).cast("double") / F.lit(float(h)), 6)

    def mase(c):
        return F.when(
            F.col("_sd") > 0,
            F.round(
                (F.col(c) * (F.col("ntr") - s)).cast("double")
                / (F.lit(float(h)) * F.col("_sd").cast("double")),
                6,
            ),
        )

    return scored.select(
        "key",
        F.col("n").alias("n_ticks"),
        mae("_sae_n").alias("naive_mae"),
        mae("_sae_s").alias("snaive_mae"),
        mae("_sae_h").alias("holt_mae"),
        mase("_sae_n").alias("naive_mase"),
        mase("_sae_s").alias("snaive_mase"),
        mase("_sae_h").alias("holt_mase"),
    )


def decayed_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    ref_date: str,
    half_life_days: int = 7,
    horizon_halflives: int = 20,
) -> DataFrame:
    """Exponentially time-decayed counts — the trending/recency score
    (Cormode, Shkapenyuk, Srivastava & Xu 2009 forward-decay family,
    half-life form): each event aged ``d`` whole days at ``ref_date``
    contributes weight 2^(−d/h).

    Determinism discipline: the weight for every integer day age is
    frozen ONCE in the driver (round(10⁶·2^(−d/h)), ages beyond
    ``horizon_halflives``·h contribute 0) and shipped as a broadcast
    table, so the score is an integer sum — order-free, mergeable
    (union + re-sum, the streaming property that makes decayed counters
    practical), and mirrored verbatim by a VALUES table in SQL.

    Events dated after ``ref_date`` (negative age) are excluded.
    Output: (key, n_events, decayed_micro)."""
    if half_life_days < 1:
        raise ValueError("half_life_days must be >= 1")
    horizon = half_life_days * horizon_halflives
    weights = [
        (d, round(1_000_000 * 2.0 ** (-d / half_life_days)))
        for d in range(horizon + 1)
    ]
    wdf = df.sparkSession.createDataFrame(weights, "age int, w bigint")
    aged = df.select(
        F.col(key_col).alias("key"),
        F.datediff(F.lit(ref_date).cast("date"),
                   F.col(ts_col).cast("date")).alias("age"),
    ).filter(F.col("age") >= 0)
    return (
        aged.join(F.broadcast(wdf), "age", "left")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.coalesce("w", F.lit(0))).cast("bigint")
            .alias("decayed_micro"),
        )
    )
