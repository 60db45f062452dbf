import pytest

from kgforge.datapipe.timeseries import fill_gaps


def _run(spark, rows, step=1):
    df = spark.createDataFrame(rows, "k string, ts int, v int")
    out = fill_gaps(df, "k", "ts", ["v"], step=step)
    return {(r["k"], r["ts"], r["is_observed"], r["v"]) for r in out.collect()}


def test_gaps_filled_forward(spark):
    rows = [("a", 1, 10), ("a", 4, 40), ("b", 2, 5)]
    assert _run(spark, rows) == {
        ("a", 1, True, 10),
        ("a", 2, False, 10),
        ("a", 3, False, 10),
        ("a", 4, True, 40),
        ("b", 2, True, 5),
    }


def test_observed_null_value_carries_previous(spark):
    rows = [("a", 1, 7), ("a", 2, None), ("a", 3, 9)]
    got = _run(spark, rows)
    # tick 2 is observed but its null value forward-fills from tick 1
    assert ("a", 2, True, 7) in got and ("a", 3, True, 9) in got


def test_step_grid(spark):
    rows = [("a", 0, 1), ("a", 6, 2)]
    assert _run(spark, rows, step=3) == {
        ("a", 0, True, 1),
        ("a", 3, False, 1),
        ("a", 6, True, 2),
    }


def test_single_observation_key(spark):
    assert _run(spark, [("z", 5, 3)]) == {("z", 5, True, 3)}


def test_bad_args(spark):
    df = spark.createDataFrame([("a", 1, 1)], "k string, ts int, v int")
    with pytest.raises(ValueError):
        fill_gaps(df, "k", "ts", ["v"], step=0)
    with pytest.raises(ValueError):
        fill_gaps(df, "k", "ts", [])


# ---------------------------------------------------------------------------
# holt_linear
# ---------------------------------------------------------------------------

def _holt_ref(xs):
    l, b = xs[0], 0
    for x in xs[1:]:
        # Java div truncates toward zero
        t = x + l + b
        l2 = t // 2 if t >= 0 else -((-t) // 2)
        d = b + (l2 - l)
        b = d // 2 if d >= 0 else -((-d) // 2)
        l = l2
    return l, b


def test_holt_matches_reference_fold(spark):
    from kgforge.datapipe.timeseries import holt_linear

    xs = [10, 14, 6, 20, -3, 7, 7, 100]
    rows = [("a", i, x) for i, x in enumerate(xs)] + [("b", 0, 5)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    got = {r["key"]: (r["n_ticks"], r["level"], r["trend"], r["forecast"])
           for r in holt_linear(df, "k", "t", "v").collect()}
    l, b = _holt_ref(xs)
    assert got["a"] == (len(xs), l, b, l + b)
    assert got["b"] == (1, 5, 0, 5)


def test_holt_partition_invariant(spark):
    from kgforge.datapipe.timeseries import holt_linear

    rows = [("k", i, (i * 37) % 101 - 50) for i in range(200)]
    df1 = spark.createDataFrame(rows, "k string, t int, v long")
    a = holt_linear(df1.repartition(1), "k", "t", "v").collect()[0]
    b = holt_linear(df1.repartition(16), "k", "t", "v").collect()[0]
    assert (a["level"], a["trend"]) == (b["level"], b["trend"])


# ---------------------------------------------------------------------------
# rolling_zscore
# ---------------------------------------------------------------------------

def test_zscore_trailing_window_excludes_self(spark):
    from kgforge.datapipe.timeseries import rolling_zscore

    rows = [("a", 1, 10), ("a", 2, 14), ("a", 3, 6), ("a", 4, 20)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    got = {r["ts"]: (r["n_prev"], r["z"], r["is_anomaly"])
           for r in rolling_zscore(df, "k", "t", "v", window=3,
                                   threshold=2.0).collect()}
    assert got[1] == (0, None, None)
    assert got[2] == (1, None, None)
    # prev {10,14}: mean 12, pop sigma 2 -> z = -3
    assert got[3] == (2, -3.0, True)
    # prev {10,14,6}: mean 10, pop sigma sqrt(32/3) -> z ~ 3.061862
    assert got[4][0] == 3 and abs(got[4][1] - 3.061862) < 1e-6 and got[4][2]


def test_zscore_constant_history_null(spark):
    from kgforge.datapipe.timeseries import rolling_zscore

    rows = [("a", i, 7) for i in range(5)] + [("a", 5, 99)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    got = {r["ts"]: r["z"] for r in
           rolling_zscore(df, "k", "t", "v", window=4).collect()}
    # zero trailing variance -> NULL score even for the wild value
    assert got[5] is None


# ---------------------------------------------------------------------------
# activity_streaks
# ---------------------------------------------------------------------------

def test_streaks_islands(spark):
    from kgforge.datapipe.timeseries import activity_streaks

    rows = [("a", d) for d in (1, 2, 3, 7, 8, 2)] + [("b", 5)]
    df = spark.createDataFrame(rows, "k string, d long")
    got = {r["key"]: (r["n_active_days"], r["n_streaks"], r["longest_streak"],
                      r["latest_streak"], r["latest_streak_end"])
           for r in activity_streaks(df, "k", "d").collect()}
    assert got["a"] == (5, 2, 3, 2, 8)
    assert got["b"] == (1, 1, 1, 1, 5)


def test_streaks_single_long_run(spark):
    from kgforge.datapipe.timeseries import activity_streaks

    df = spark.createDataFrame([("k", d) for d in range(100, 200)],
                               "k string, d long")
    r = activity_streaks(df, "k", "d").collect()[0]
    assert (r["n_streaks"], r["longest_streak"], r["latest_streak_end"]) == (1, 100, 199)


# ---------------------------------------------------------------------------
# forecast_backtest
# ---------------------------------------------------------------------------

def _jdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_backtest_matches_python_mirror(spark):
    from kgforge.datapipe.timeseries import forecast_backtest

    import random

    rng = random.Random(3)
    xs = [100 + 10 * (i % 7) + rng.randrange(-5, 6) for i in range(40)]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, t int, v long"
    )
    got = forecast_backtest(df, "k", "t", "v", horizon=7, season=7).collect()[0]

    h, s = 7, 7
    ntr = len(xs) - h
    train, test = xs[:ntr], xs[ntr:]
    l, b = train[0], 0
    for x in train[1:]:
        l2 = _jdiv(x + l + b, 2)
        b = _jdiv(b + (l2 - l), 2)
        l = l2
    sae_n = sum(abs(test[i] - train[-1]) for i in range(h))
    sae_s = sum(
        abs(test[i] - xs[ntr + (i + 1) - s * ((i + s) // s) - 1]) for i in range(h)
    )
    sae_h = sum(abs(test[i] - (l + (i + 1) * b)) for i in range(h))
    sd = sum(abs(train[t] - train[t - s]) for t in range(s, ntr))
    assert got["naive_mae"] == round(sae_n / h, 6)
    assert got["snaive_mae"] == round(sae_s / h, 6)
    assert got["holt_mae"] == round(sae_h / h, 6)
    assert got["naive_mase"] == round(sae_n * (ntr - s) / (h * sd), 6)
    # seasonal series: snaive must beat naive
    assert got["snaive_mae"] < got["naive_mae"]


def test_backtest_drops_short_and_nulls_constant(spark):
    from kgforge.datapipe.timeseries import forecast_backtest

    rows = [("short", i, i) for i in range(10)] + [
        ("const", i, 5) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    out = {r["key"]: r for r in
           forecast_backtest(df, "k", "t", "v", horizon=7, season=7).collect()}
    assert "short" not in out  # 10 < 7 + 7 + 1
    c = out["const"]
    assert c["naive_mae"] == 0.0 and c["naive_mase"] is None


def test_backtest_validates_args(spark):
    from kgforge.datapipe.timeseries import forecast_backtest

    df = spark.createDataFrame([("k", 0, 0)], "k string, t int, v long")
    import pytest as _pt

    with _pt.raises(ValueError):
        forecast_backtest(df, "k", "t", "v", horizon=0)
    with _pt.raises(ValueError):
        forecast_backtest(df, "k", "t", "v", horizon=1, season=0)
