"""Unit tests for EWMA fold, PSI drift, and Gini concentration."""

from __future__ import annotations

import math

from kgforge.datapipe.profile import gini_concentration, psi_drift
from kgforge.datapipe.timeseries import ewma_halflife


def _series(spark, xs, key=1):
    return spark.createDataFrame(
        [(key, i, v) for i, v in enumerate(xs)], "k int, t int, x long"
    )


def test_ewma_recursion_exact(spark):
    xs = [100, 50, 200, 10]
    r = ewma_halflife(_series(spark, xs), "k", "t", "x").collect()[0]
    s = xs[0]
    for v in xs[1:]:
        s = (s + v) // 2
    assert (r.n_ticks, r.last_value, r.ewma) == (4, 10, s)


def test_ewma_single_tick_is_identity(spark):
    r = ewma_halflife(_series(spark, [42]), "k", "t", "x").collect()[0]
    assert (r.n_ticks, r.ewma) == (1, 42)


def test_ewma_order_is_by_tick_not_arrival(spark):
    df = spark.createDataFrame(
        [(1, 2, 300), (1, 0, 100), (1, 1, 200)], "k int, t int, x long"
    )
    r = ewma_halflife(df, "k", "t", "x").collect()[0]
    assert r.ewma == (((100 + 200) // 2) + 300) // 2
    assert r.last_value == 300


def _vals(spark, xs):
    return spark.createDataFrame([(int(v),) for v in xs], "v long")


def test_psi_identical_distributions_near_zero(spark):
    base = _vals(spark, range(100))
    curr = _vals(spark, range(100))
    rows = psi_drift(base, curr, "v", bins=10).collect()
    assert len(rows) == 10
    assert all(r.psi == rows[0].psi for r in rows)
    assert abs(rows[0].psi) < 1e-6
    assert all(r.n_base == r.n_curr == 10 for r in rows)


def test_psi_shifted_distribution_flags_drift(spark):
    base = _vals(spark, range(100))
    curr = _vals(spark, range(150, 250))  # all clamp into the top bin
    rows = psi_drift(base, curr, "v", bins=10).collect()
    top = {r.bin: r for r in rows}[9]
    assert top.n_curr == 100
    assert rows[0].psi > 0.25  # "shifted" by the standard rule of thumb


def test_psi_hand_computed_terms(spark):
    base = _vals(spark, [0, 0, 9, 9])  # bins 0 and 9, 2 each
    curr = _vals(spark, [0, 9, 9, 9])
    rows = {r.bin: r for r in psi_drift(base, curr, "v", bins=10).collect()}
    p0, q0 = (2 + 1) / (4 + 10), (1 + 1) / (4 + 10)
    assert rows[0].term == round((p0 - q0) * math.log(p0 / q0), 6)
    p_e, q_e = 1 / 14, 1 / 14
    assert rows[5].term == 0.0 and rows[5].p_base == round(p_e, 6)


def test_gini_equal_values_zero(spark):
    df = spark.createDataFrame([(i, 100) for i in range(8)], "k int, x long")
    r = gini_concentration(df, "k", "x").collect()[0]
    assert r.gini == 0.0 and r.n == 8 and r.total == 800


def test_gini_total_concentration(spark):
    # one key owns everything: G -> (n-1)/n
    df = spark.createDataFrame(
        [(0, 1000)] + [(i, 0) for i in range(1, 10)], "k int, x long"
    )
    r = gini_concentration(df, "k", "x").collect()[0]
    assert r.gini == round((10 - 1) / 10, 6)


def test_gini_hand_computed(spark):
    xs = [1, 2, 3, 4]
    df = spark.createDataFrame(list(enumerate(xs)), "k int, x long")
    r = gini_concentration(df, "k", "x").collect()[0]
    n, s = 4, 10
    s2 = sum((i + 1) * v for i, v in enumerate(sorted(xs)))
    assert r.gini == round(2 * s2 / (n * s) - (n + 1) / n, 6)


def test_gini_zero_total_null(spark):
    df = spark.createDataFrame([(1, 0), (2, 0)], "k int, x long")
    r = gini_concentration(df, "k", "x").collect()[0]
    assert r.gini is None
