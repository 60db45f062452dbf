"""Derandomized Efraimidis-Spirakis sampling: mirror + bias property."""

from __future__ import annotations

import pytest

from kgforge.datapipe.mix import weighted_sample

_P = 2147483647


def _py_key(i, w, salt="ws"):
    acc = 0
    for ch in f"{i}:{salt}":
        acc = (acc * 31 + ord(ch)) % _P
    u = (acc + 1) / float(_P + 1)
    return round(u ** (1.0 / w), 9)


def test_matches_mirror(spark):
    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    got = [r["id"] for r in weighted_sample(df, "id", "w", 25).collect()]
    want = [
        i for i, _ in sorted(
            rows, key=lambda t: (-_py_key(t[0], t[1]), t[0])
        )[:25]
    ]
    assert got == want


def test_weight_bias(spark):
    # ids 0..999: half weight 10, half weight 0.1 — heavy rows dominate
    rows = [(i, 10.0 if i % 2 == 0 else 0.1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    got = [r["id"] for r in weighted_sample(df, "id", "w", 100).collect()]
    heavy = sum(1 for i in got if i % 2 == 0)
    assert heavy > 90


def test_nonpositive_weights_excluded(spark):
    rows = [(1, 0.0), (2, -3.0), (3, 1.0), (4, None)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    got = {r["id"] for r in weighted_sample(df, "id", "w", 10).collect()}
    assert got == {3}
