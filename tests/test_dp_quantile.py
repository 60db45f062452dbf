"""Python mirror for the derandomized exponential-mechanism DP median
(anonymize/privacy.py:dp_quantile)."""

from __future__ import annotations

import math

import pytest

from kgforge.anonymize.privacy import dp_quantile

_MOD = 2147483647
MICRO = 1_000_000


def _poly(s: str, mult: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % _MOD
    return acc


def _stage2_padded_py(s: str) -> int:
    return _poly(str(_poly(s, 1000003)).rjust(10, "0"), 1009)


def _py_dp_median(values, lo, hi, eps, group_key, seed="dpq"):
    vs = sorted(v for v in values if lo <= v <= hi)
    n = len(vs)
    m = n // 2
    # gaps: 0 → [lo, vs[0]); i in 1..n → [vs[i-1], next or hi)
    gaps = [(0, lo, vs[0])] + [
        (i, vs[i - 1], vs[i] if i < n else hi) for i in range(1, n + 1)
    ]
    ladder, cum = [], 0
    for i, left, right in sorted(gaps):
        wf = round(math.exp(-eps * abs(i - m) / 2.0) * MICRO)
        cum += (right - left) * wf
        ladder.append((i, left, right, cum))
    tot = cum
    u1 = _stage2_padded_py(f"{group_key}:{seed}:gap")
    target = (tot // _MOD) * u1 + ((tot % _MOD) * u1) // _MOD
    for i, left, right, c in ladder:
        if c > target:
            u2 = _stage2_padded_py(f"{group_key}:{seed}:off")
            return n, left + (u2 * (right - left)) // _MOD
    raise AssertionError("ladder never crossed")


def test_dp_quantile_matches_python_mirror(spark):
    rows = [("a", v) for v in [5, 10, 10, 20, 40, 41, 42, 90]] + [
        ("b", v) for v in [100, 200, 300]] + [
        ("a", -5), ("a", 2000)]          # out of bounds → dropped
    df = spark.createDataFrame(rows, "g string, v int")
    got = {r["g"]: (r["n"], r["released"])
           for r in dp_quantile(df, ["g"], "v", lo=0, hi=1000,
                                epsilon=1.0).collect()}
    exp_a = _py_dp_median([v for g, v in rows if g == "a"], 0, 1000, 1.0, "a")
    exp_b = _py_dp_median([v for g, v in rows if g == "b"], 0, 1000, 1.0, "b")
    assert got["a"] == exp_a
    assert got["b"] == exp_b
    # deterministic across runs
    again = {r["g"]: r["released"]
             for r in dp_quantile(df, ["g"], "v", lo=0, hi=1000,
                                  epsilon=1.0).collect()}
    assert again == {g: rel for g, (_n, rel) in got.items()}
    # a different seed gives a different (fresh) release for some group
    other = {r["g"]: r["released"]
             for r in dp_quantile(df, ["g"], "v", lo=0, hi=1000,
                                  epsilon=1.0, seed="dpq2").collect()}
    assert other != {g: rel for g, (_n, rel) in got.items()}


def test_dp_quantile_utility_at_high_epsilon(spark):
    # strong epsilon → release lands near the true median
    vals = list(range(400, 501)) * 3            # median 450, n=303
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v int")
    got = dp_quantile(df, ["g"], "v", lo=0, hi=10000,
                      epsilon=8.0).collect()[0]
    assert abs(got["released"] - 450) <= 25


def test_dp_quantile_validates_bounds(spark):
    df = spark.createDataFrame([("g", 1)], "g string, v int")
    with pytest.raises(ValueError):
        dp_quantile(df, ["g"], "v", lo=10, hi=10, epsilon=1.0)
