"""Python mirrors for CMS heavy-change (datapipe/sketch.py) and
time-decayed counts (datapipe/timeseries.py)."""

from __future__ import annotations

import pytest

from datetime import date, datetime

from kgforge.datapipe.sketch import cms_heavy_change
from kgforge.datapipe.timeseries import decayed_counts

_MOD = 2147483647


def _poly(s: str, mult: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % _MOD
    return acc


def _stage2_py(s: str, m1: int, m2: int) -> int:
    return _poly(str(_poly(s, m1)), m2)


def _py_cms_est(values, probe, depth=4, width=512,
                mults=(31, 131, 1009, 10007)):
    regs = [{} for _ in range(depth)]
    for v in values:
        for j in range(depth):
            slot = _stage2_py(v, mults[j], 131) % width
            regs[j][slot] = regs[j].get(slot, 0) + 1
    return min(
        regs[j].get(_stage2_py(probe, mults[j], 131) % width, 0)
        for j in range(depth)
    )


@pytest.mark.slow
def test_cms_heavy_change_detects_planted_drift(spark):
    a_vals = [f"k{i % 20}" for i in range(400)]           # 20 each
    b_vals = [f"k{i % 20}" for i in range(400)] + ["k3"] * 60 + ["k7"] * 45
    a = spark.createDataFrame([(v,) for v in a_vals], "v string")
    b = spark.createDataFrame([(v,) for v in b_vals], "v string")
    got = {r["value"]: (r["est_a"], r["est_b"], r["delta"])
           for r in cms_heavy_change(a, b, "v", threshold=40).collect()}
    # exact register mirror (collisions included)
    for key in got:
        assert got[key][0] == _py_cms_est(a_vals, key)
        assert got[key][1] == _py_cms_est(b_vals, key)
        assert got[key][2] == got[key][1] - got[key][0]
    # the two planted drifts are reported (CMS can only over-report)
    assert "k3" in got and got["k3"][2] >= 60
    assert "k7" in got and got["k7"][2] >= 45


def test_cms_heavy_change_symmetric_decrease(spark):
    a = spark.createDataFrame([("x",)] * 100 + [("y",)] * 5, "v string")
    b = spark.createDataFrame([("x",)] * 10 + [("y",)] * 5, "v string")
    got = {r["value"]: r["delta"]
           for r in cms_heavy_change(a, b, "v", threshold=50).collect()}
    assert got.get("x", 0) <= -50 and "y" not in got


def _py_decayed(rows, ref, h, horizon_hl=20):
    out = {}
    horizon = h * horizon_hl
    for k, ts in rows:
        age = (ref - ts.date()).days
        if age < 0:
            continue
        w = round(1_000_000 * 2.0 ** (-age / h)) if age <= horizon else 0
        n, s = out.get(k, (0, 0))
        out[k] = (n + 1, s + w)
    return out


def test_decayed_counts_match_python_mirror(spark):
    rows = [
        ("a", datetime(2024, 1, 30, 12)), ("a", datetime(2024, 1, 1)),
        ("a", datetime(2023, 1, 1)),          # beyond horizon → weight 0
        ("b", datetime(2024, 1, 29)), ("b", datetime(2024, 2, 2)),  # future
        ("c", datetime(2024, 1, 31, 23, 59)),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {r["key"]: (r["n_events"], r["decayed_micro"])
           for r in decayed_counts(df, "k", "ts", "2024-02-01",
                                   half_life_days=7).collect()}
    exp = _py_decayed(rows, date(2024, 2, 1), 7)
    assert got == exp
    # recency dominates: c (1 day old) outscores a's three older events
    assert got["c"][1] > got["a"][1]
