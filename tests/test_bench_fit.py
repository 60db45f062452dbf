"""Unit tests for bench.py's T(c)=F+W/c fit reporting (round-4 verdict
items 1 and 7): unclamped fitted efficiency, the fit_ok honesty gate, and
the F>=0 floor.  Pure python — no Spark session."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _fit_report  # noqa: E402


def test_clean_fit_is_ok_and_matches_model():
    # exact T(c) = 10 + 200/c: F recovered, residuals 0, fitted unclamped
    secs = {2: 110.0, 4: 60.0, 8: 35.0}
    rep = _fit_report(secs, 2, 8)
    assert rep["fit_ok"] is True
    assert abs(rep["fit_fixed_cost_sec"] - 10.0) < 1e-6
    assert abs(rep["fit_work_sec"] - 200.0) < 1e-6
    assert max(float(v) for v in rep["fit_rel_residuals"].values()) < 1e-6
    # fitted = (110-10) / (4*(35-10)) = 1.0 exactly
    assert abs(rep["fitted_efficiency"] - 1.0) < 1e-6


def test_r04_anon_legs_flag_fit_not_ok_and_report_unclamped():
    # the round-4 canonical anon witness: a throttled 4-core middle leg
    # (only 11% faster than 2 cores) drags the fit to F=36.3 and a
    # fitted efficiency of ~3.4 — previously clamped to 1.5, now emitted
    # unclamped but flagged fit_ok=False by the residual gate
    secs = {2: 153.6, 4: 136.6, 8: 44.8}
    rep = _fit_report(secs, 2, 8)
    assert rep["fit_ok"] is False
    assert rep["fitted_efficiency"] > 1.5  # unclamped
    assert max(float(v) for v in rep["fit_rel_residuals"].values()) > 0.2


def test_negative_fixed_cost_floors_to_zero():
    # a slow 2c leg makes the least-squares F negative (physically
    # meaningless); the report keeps the raw value, floors F to 0,
    # refits W alone, and flags fit_ok=False
    secs = {2: 400.0, 4: 100.0, 8: 50.0}
    rep = _fit_report(secs, 2, 8)
    assert rep["fit_fixed_cost_raw_sec"] < 0
    assert rep["fit_fixed_cost_sec"] == 0.0
    assert rep["fit_ok"] is False
    # with F=0 the fitted ratio equals the raw ratio T(2)/(4*T(8))
    assert abs(rep["fitted_efficiency"] - 400.0 / (4 * 50.0)) < 1e-6


def test_degenerate_fit_yields_none_not_astronomy():
    # 4c slower than 2c (mid-leg throttle burst): F lands above T(8), the
    # ratio denominator goes nonpositive — emit None, never 1.6e10
    secs = {2: 108.0, 4: 120.0, 8: 38.0}
    rep = _fit_report(secs, 2, 8)
    assert rep["fitted_efficiency"] is None
    assert rep["fit_ok"] is False
