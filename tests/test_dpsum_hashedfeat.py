"""Unit mirrors for anonymize.privacy.dp_group_sums and
textstats.hashed_features."""

from __future__ import annotations

import math

from kgforge.anonymize.privacy import dp_group_sums
from kgforge.datapipe.textstats import hashed_features

_MOD = 2147483647


def _poly(s: str, mult: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % _MOD
    return acc


def _stage2_padded_py(s: str) -> int:
    return _poly(str(_poly(s, 1000003)).rjust(10, "0"), 1009)


def _laplace_noise(key: str, seed: str, b: float) -> float:
    u = (_poly(key + ":" + seed, 31) + 1) / (_MOD + 1)
    v = u - 0.5
    return -b * math.copysign(1.0, v) * math.log(1.0 - 2.0 * abs(v)) if v != 0 else 0.0


def test_dp_group_sums_mirror(spark):
    rows = [
        ("a", 5.25), ("a", 120.00), ("a", -3.50), ("a", None),
        ("b", 7.00), ("b", 9.99),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in dp_group_sums(df, ["g"], "v", lo=0.0, hi=100.0,
                                            epsilon=0.5).collect()}
    b = 100.0 / 0.5
    for g in ("a", "b"):
        cents = sum(
            int(round(min(100.0, max(0.0, v)) * 100))
            for gg, v in rows if gg == g and v is not None
        )
        want_sum = cents / 100
        assert got[g]["clipped_sum"] == want_sum
        want_rel = round(want_sum + _laplace_noise(g, "dpsum", b), 6)
        assert abs(got[g]["released"] - want_rel) <= 1e-6
    # clipping applied: group a's 120.00 contributes 100, -3.50 contributes 0
    assert got["a"]["clipped_sum"] == 105.25


def test_dp_group_sums_noise_scales_with_epsilon(spark):
    df = spark.createDataFrame([("a", 10.0)], "g string, v double")
    r1 = dp_group_sums(df, ["g"], "v", 0.0, 100.0, epsilon=1.0).collect()[0]
    r2 = dp_group_sums(df, ["g"], "v", 0.0, 100.0, epsilon=0.1).collect()[0]
    n1 = abs(r1["released"] - r1["clipped_sum"])
    n2 = abs(r2["released"] - r2["clipped_sum"])
    assert abs(n2 - 10 * n1) < 1e-4  # same draw, 10x the scale


def test_hashed_features_mirror_and_collision_sign(spark):
    rows = [(1, "the cat sat on the mat"), (2, "dog dog  DOG"), (3, "  ")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {(r["id"], r["dim"]): r["weight"]
           for r in hashed_features(df, "id", "text", dims=16).collect()}

    want: dict[tuple[int, int], int] = {}
    for i, text in rows:
        for tok in text.lower().strip().split():
            if not tok:
                continue
            h = _stage2_padded_py(tok)
            dim = h % 16
            sign = 1 if h % 32 < 16 else -1
            want[(i, dim)] = want.get((i, dim), 0) + sign
    assert got == want
    # case folding: "dog dog DOG" is one token hashed three times
    dog = _stage2_padded_py("dog")
    assert abs(got[(2, dog % 16)]) == 3


def test_hashed_features_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "id int, text string")
    plan = (
        hashed_features(df, "id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
