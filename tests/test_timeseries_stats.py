"""Unit tests for the time-series statistics operators: per-key ACF,
Theil–Sen robust slope, day-of-week seasonal index — each against a
plain-python mirror."""

from __future__ import annotations

import statistics

from pyspark.sql import Row

from kgforge.datapipe.timeseries import (
    acf_by_key,
    seasonal_dow_index,
    theil_sen_slope,
)


def _acf_py(xs, k):
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    if den == 0:
        return None
    num = sum((xs[t] - m) * (xs[t + k] - m) for t in range(n - k))
    return round(num / den, 6)


def _series_df(spark, xs, key=1):
    return spark.createDataFrame(
        [Row(k=key, t=i, x=v) for i, v in enumerate(xs)]
    )


def test_acf_matches_python_mirror(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    out = {
        r.lag: r
        for r in acf_by_key(_series_df(spark, xs), "k", "t", "x", 3).collect()
    }
    for k in (1, 2, 3):
        assert out[k].n_pairs == len(xs) - k
        assert out[k].acf == _acf_py(xs, k), f"lag {k}"


def test_acf_constant_series_is_null(spark):
    out = acf_by_key(_series_df(spark, [7, 7, 7, 7]), "k", "t", "x", 2).collect()
    assert all(r.acf is None for r in out)


def test_acf_alternating_series_negative_lag1(spark):
    out = {
        r.lag: r.acf
        for r in acf_by_key(
            _series_df(spark, [1, -1] * 6), "k", "t", "x", 2
        ).collect()
    }
    assert out[1] < 0 < out[2]


def test_acf_short_series_lag_beyond_length(spark):
    out = {
        r.lag: r
        for r in acf_by_key(_series_df(spark, [1, 5]), "k", "t", "x", 3).collect()
    }
    assert out[3].n_pairs == 0 and out[3].acf is None


def _theil_py(points):
    slopes = sorted(
        (x2 - x1) / (t2 - t1)
        for i, (t1, x1) in enumerate(points)
        for (t2, x2) in points[i + 1 :]
    )
    return round(statistics.median(slopes), 6), len(slopes)


def test_theil_sen_exact_line(spark):
    pts = [(t, 3 * t + 2) for t in range(6)]
    df = spark.createDataFrame([Row(k=1, t=t, x=x) for t, x in pts])
    r = theil_sen_slope(df, "k", "t", "x").collect()[0]
    assert r.slope == 3.0 and r.n_pairs == 15


def test_theil_sen_outlier_immune(spark):
    # a slope-2 line with one wild outlier; OLS would be dragged, the
    # median slope stays 2
    pts = [(0, 0), (1, 2), (2, 4), (3, 6), (4, 8), (5, 1000)]
    df = spark.createDataFrame([Row(k=1, t=t, x=x) for t, x in pts])
    r = theil_sen_slope(df, "k", "t", "x").collect()[0]
    exp, npairs = _theil_py(pts)
    assert r.slope == exp == 2.0
    assert r.n_pairs == npairs


def test_theil_sen_even_pair_count_median(spark):
    # 4 pairs -> median averages the 2nd and 3rd sorted slopes
    pts = [(0, 0), (1, 1), (2, 10), (4, 12)]
    df = spark.createDataFrame([Row(k=1, t=t, x=x) for t, x in pts])
    r = theil_sen_slope(df, "k", "t", "x").collect()[0]
    exp, npairs = _theil_py(pts)
    assert r.n_pairs == npairs == 6
    assert r.slope == exp


def test_theil_sen_single_point_absent(spark):
    df = spark.createDataFrame([Row(k=1, t=0, x=5)])
    assert theil_sen_slope(df, "k", "t", "x").count() == 0


def test_seasonal_dow_index(spark):
    # days 0..13 (day 0 = Thursday -> dow 4); key mean = 10;
    # give Mondays (dow 0: days 4 and 11) value 30, everything else 10
    rows = []
    for d in range(14):
        dow = (d + 4) % 7
        rows.append(Row(k=1, day=d, x=30 if dow == 0 else 10))
    df = spark.createDataFrame(rows)
    out = {r.dow: r for r in seasonal_dow_index(df, "k", "day", "x").collect()}
    total = sum(r.x for r in rows)
    assert out[0].n_days == 2
    assert out[0].seasonal_index == round((60 * 14) / (2 * total), 6)
    assert out[4].seasonal_index == round((20 * 14) / (2 * total), 6)
