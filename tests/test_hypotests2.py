"""Unit mirrors for anova_oneway / welch_ttest / kendall_tau
(kgforge.datapipe.hypotests): independent pure-python recomputation at the
operator's round-6 contract."""

from __future__ import annotations

import math
import random

from kgforge.datapipe.hypotests import anova_oneway, kendall_tau, welch_ttest


def _erfc_as(x: float) -> float:
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * math.exp(-(x * x))


def _grouped_rows(seed=11, groups=("g0", "g1", "g2"), n=250):
    rng = random.Random(seed)
    rows = []
    for gi, g in enumerate(groups):
        for _ in range(n + gi * 17):
            # two-decimal money-like values so scale=100 is exact
            rows.append((g, round(rng.gauss(10.0 + 0.4 * gi, 3.0), 2)))
    return rows


def test_anova_oneway_matches_python_mirror(spark):
    rows = _grouped_rows()
    df = spark.createDataFrame(rows, "g string, v double")
    got = anova_oneway(df, "g", "v").collect()[0]

    by = {}
    for g, v in rows:
        by.setdefault(g, []).append(int(round(v * 100)))
    n = sum(len(xs) for xs in by.values())
    s = sum(sum(xs) for xs in by.values())
    q = sum(x * x for xs in by.values() for x in xs)
    sw = 0.0
    for g in sorted(by):  # fixed fold order, same as the operator
        xs = by[g]
        sw += float(sum(xs)) * sum(xs) / len(xs)
    sstot = q - float(s) * s / n
    ssb = sw - float(s) * s / n
    ssw = sstot - ssb
    k = len(by)
    d1, d2 = float(k - 1), float(n - k)
    fstat = (ssb / d1) / (ssw / d2)
    cbrt = fstat ** (1.0 / 3.0)
    z = ((1 - 2 / (9 * d2)) * cbrt - (1 - 2 / (9 * d1))) / math.sqrt(
        cbrt * cbrt * 2 / (9 * d2) + 2 / (9 * d1)
    )
    half = _erfc_as(abs(z) / math.sqrt(2.0)) / 2.0
    p = half if z >= 0 else 1.0 - half
    assert got["n"] == n and got["k_groups"] == k
    assert abs(got["f_stat"] - round(fstat, 6)) <= 1e-6
    assert abs(got["eta_sq"] - round(ssb / sstot, 6)) <= 1e-6
    assert abs(got["p_value"] - round(p, 6)) <= 1e-6
    # sanity: shifted means on 250+ rows per group must reject at 5%
    assert got["p_value"] < 0.05


def test_anova_single_group_yields_nulls(spark):
    df = spark.createDataFrame([("g0", 1.0), ("g0", 2.0)], "g string, v double")
    row = anova_oneway(df, "g", "v").collect()[0]
    assert row["k_groups"] == 1
    assert row["f_stat"] is None and row["p_value"] is None


def test_welch_ttest_matches_python_mirror(spark):
    rows = _grouped_rows(seed=23, groups=("a", "b"), n=300)
    df = spark.createDataFrame(rows, "g string, v double")
    got = welch_ttest(df, "g", "v", "a", "b").collect()[0]

    xa = [int(round(v * 100)) for g, v in rows if g == "a"]
    xb = [int(round(v * 100)) for g, v in rows if g == "b"]
    na, nb = len(xa), len(xb)
    va = (sum(x * x for x in xa) - float(sum(xa)) ** 2 / na) / (na - 1)
    vb = (sum(x * x for x in xb) - float(sum(xb)) ** 2 / nb) / (nb - 1)
    ua, ub = va / na, vb / nb
    t = (sum(xa) / na - sum(xb) / nb) / math.sqrt(ua + ub)
    dfw = (ua + ub) ** 2 / (ua * ua / (na - 1) + ub * ub / (nb - 1))
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["t_stat"] - round(t, 6)) <= 1e-6
    assert abs(got["df_ws"] - round(dfw, 6)) <= 1e-6
    assert abs(got["p_value"] - round(_erfc_as(abs(t) / math.sqrt(2.0)), 6)) <= 1e-6


def test_kendall_tau_matches_bruteforce(spark):
    rng = random.Random(5)
    rows = [
        (f"id{i:03d}", rng.randrange(0, 20), rng.randrange(0, 20))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "i string, a int, b int")
    got = kendall_tau(df, "i", "a", "b").collect()[0]

    c = d = tx = ty = 0
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            sa = (rows[i][1] > rows[j][1]) - (rows[i][1] < rows[j][1])
            sb = (rows[i][2] > rows[j][2]) - (rows[i][2] < rows[j][2])
            if sa * sb == 1:
                c += 1
            elif sa * sb == -1:
                d += 1
            elif sa == 0 and sb != 0:
                tx += 1
            elif sb == 0 and sa != 0:
                ty += 1
    assert (got["concordant"], got["discordant"]) == (c, d)
    assert (got["ties_a"], got["ties_b"]) == (tx, ty)
    den = math.sqrt((c + d + tx) * (c + d + ty))
    assert abs(got["tau_b"] - round((c - d) / den, 6)) <= 1e-6


def test_kendall_tau_sampling_thins_by_portable_hash(spark):
    rows = [(f"id{i:03d}", i, i) for i in range(200)]
    df = spark.createDataFrame(rows, "i string, a int, b int")
    got = kendall_tau(df, "i", "a", "b", sample_mod=4).collect()[0]
    # perfectly concordant data: tau_b = 1 on whatever sample survives
    assert got["tau_b"] == 1.0
    assert 0 < got["n"] < 200
