"""Unit mirrors for kgforge.datapipe.hypotests: each test recomputes the
statistic with an independent pure-python implementation (sorting-based
midranks, direct CDF walk, direct contingency expectation) and compares at
the operator's own round-6 contract."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from kgforge.datapipe.hypotests import (
    chi_square_independence,
    ks_two_sample,
    mann_whitney_u,
    spearman_corr,
)


def _erfc_as(x: float) -> float:
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * math.exp(-(x * x))


def _two_sample_rows(seed=7, na=400, nb=300, shift=0.3, quantized=False):
    rng = random.Random(seed)
    rows = []
    for _ in range(na):
        v = rng.gauss(0.0, 1.0)
        rows.append((float(round(v)) if quantized else v, "a"))
    for _ in range(nb):
        v = rng.gauss(shift, 1.0)
        rows.append((float(round(v)) if quantized else v, "b"))
    return rows


def _ks_mirror(rows):
    xa = sorted(v for v, g in rows if g == "a")
    xb = sorted(v for v, g in rows if g == "b")
    na, nb = len(xa), len(xb)
    d = 0.0
    for v in sorted(set(xa) | set(xb)):
        fa = sum(1 for x in xa if x <= v) / na
        fb = sum(1 for x in xb if x <= v) / nb
        d = max(d, abs(fa - fb))
    ne = na * nb / (na + nb)
    en = math.sqrt(ne)
    lam = (en + 0.12 + 0.11 / en) * d
    p = 2.0 * sum(
        (1.0 if k % 2 == 1 else -1.0) * math.exp(-2.0 * k * k * lam * lam)
        for k in range(1, 101)
    )
    return na, nb, d, min(1.0, max(0.0, p))


@pytest.fixture(scope="module")
def results(spark, pool_runner):
    """Each hypothesis-test computation once, concurrently (oracle-sweep
    pooling pattern, round-4 verdict item 3); assertions per-test below."""
    def one(rows, schema, fn, *args):
        return lambda: fn(
            spark.createDataFrame(rows, schema), *args).collect()[0]

    sep = [(float(i), "a") for i in range(200)] + [
        (float(i + 400), "b") for i in range(200)
    ]
    rng = random.Random(5)
    chi_pairs = []
    for _ in range(3000):
        x = rng.choice("pqr")
        y = rng.choice("uv" if x == "p" else "uvw")
        chi_pairs.append((x, y))
    rng9 = random.Random(9)
    sp_rows = []
    for _ in range(800):
        a = float(rng9.randint(0, 30))
        b = a * 2 + rng9.gauss(0, 10)
        sp_rows.append((a, b))

    two = "v double, grp string"
    return pool_runner({
        "ks": one(_two_sample_rows(), two, ks_two_sample, "v", "grp", "a", "b"),
        "ks_same": one(_two_sample_rows(seed=3, shift=0.0, na=500, nb=500),
                       two, ks_two_sample, "v", "grp", "a", "b"),
        "ks_sep": one(sep, two, ks_two_sample, "v", "grp", "a", "b"),
        "mwu": one(_two_sample_rows(seed=11, quantized=True), two,
                   mann_whitney_u, "v", "grp", "a", "b"),
        "mwu_tied": one([(1.0, "a")] * 5 + [(1.0, "b")] * 7, two,
                        mann_whitney_u, "v", "grp", "a", "b"),
        "chi2": one(chi_pairs, "x string, y string",
                    chi_square_independence, "x", "y"),
        "chi2_dof0": one([("a", "u"), ("a", "v")], "x string, y string",
                         chi_square_independence, "x", "y"),
        "spearman": one(sp_rows, "a double, b double", spearman_corr, "a", "b"),
        "sp_mono": one([(float(i), float(i * i)) for i in range(50)],
                       "a double, b double", spearman_corr, "a", "b"),
        "sp_const": one([(1.0, float(i)) for i in range(10)],
                        "a double, b double", spearman_corr, "a", "b"),
    })


def test_ks_matches_python_mirror(results):
    rows = _two_sample_rows()
    got = results["ks"]
    na, nb, d, p = _ks_mirror(rows)
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["d_stat"] == round(d, 6)
    assert abs(got["p_value"] - p) < 5e-7


def test_ks_identical_distributions_high_p(results):
    assert results["ks_same"]["p_value"] > 0.2
    got2 = results["ks_sep"]
    assert got2["d_stat"] == 1.0 and got2["p_value"] == 0.0


def _mwu_mirror(rows):
    vals = sorted((v, g) for v, g in rows)
    # midranks via sort positions
    n = len(vals)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0  # average of 1-based positions i+1..j
        ranks[vals[i][0]] = mid
        i = j
    ra = sum(ranks[v] for v, g in rows if g == "a")
    na = sum(1 for _, g in rows if g == "a")
    nb = len(rows) - na
    ua = ra - na * (na + 1) / 2.0
    nn = na + nb
    from collections import Counter

    tie_t = sum(c**3 - c for c in Counter(v for v, _ in rows).values())
    var = na * nb / 12.0 * ((nn + 1) - tie_t / (nn * (nn - 1.0)))
    z = (ua - na * nb / 2.0) / math.sqrt(var) if var > 0 else None
    p = _erfc_as(abs(z) / math.sqrt(2.0)) if z is not None else None
    return na, nb, ua, z, p


def test_mwu_matches_python_mirror_with_ties(results):
    rows = _two_sample_rows(seed=11, quantized=True)  # heavy ties
    got = results["mwu"]
    na, nb, ua, z, p = _mwu_mirror(rows)
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["u_a"] == ua
    assert abs(got["z"] - z) < 5e-7
    assert abs(got["p_value"] - p) < 5e-7


def test_mwu_all_tied_is_null_z(results):
    got = results["mwu_tied"]
    assert got["z"] is None and got["p_value"] is None
    assert got["u_a"] == 5 * 7 / 2.0  # all midranks equal -> U at its mean


def _chi2_mirror(pairs):
    from collections import Counter

    cells = Counter(pairs)
    nx = Counter(x for x, _ in pairs)
    ny = Counter(y for _, y in pairs)
    n = len(pairs)
    chi2 = 0.0
    for x in nx:
        for y in ny:
            e = nx[x] * ny[y] / n
            o = cells.get((x, y), 0)
            chi2 += (o - e) ** 2 / e
    r, c = len(nx), len(ny)
    dof = (r - 1) * (c - 1)
    v = math.sqrt(chi2 / (n * min(r - 1, c - 1))) if dof else None
    nu = float(dof)
    z = ((chi2 / nu) ** (1 / 3) - (1 - 2 / (9 * nu))) / math.sqrt(2 / (9 * nu))
    p = _erfc_as(abs(z) / math.sqrt(2)) / 2
    if z < 0:
        p = 1 - p
    return n, r, c, dof, chi2, v, p


def test_chi2_matches_python_mirror(results):
    rng = random.Random(5)
    pairs = []
    for _ in range(3000):
        x = rng.choice("pqr")
        # y depends weakly on x -> nonzero chi2
        y = rng.choice("uv" if x == "p" else "uvw")
        pairs.append((x, y))
    got = results["chi2"]
    n, r, c, dof, chi2, v, p = _chi2_mirror(pairs)
    assert (got["n"], got["r_levels"], got["c_levels"], got["dof"]) == (n, r, c, dof)
    assert abs(got["chi2"] - chi2) < 1e-6
    assert abs(got["cramers_v"] - v) < 1e-6
    assert abs(got["p_value"] - p) < 5e-7


def test_chi2_single_level_dof_zero(results):
    got = results["chi2_dof0"]
    assert got["dof"] == 0
    assert got["chi2"] is None and got["cramers_v"] is None and got["p_value"] is None


def _spearman_mirror(rows):
    def midranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        r = [0.0] * len(xs)
        i = 0
        while i < len(xs):
            j = i
            while j < len(xs) and xs[order[j]] == xs[order[i]]:
                j += 1
            mid = (i + 1 + j) / 2.0
            for k in range(i, j):
                r[order[k]] = mid
            i = j
        return r

    ra = midranks([a for a, _ in rows])
    rb = midranks([b for _, b in rows])
    n = len(rows)
    mx = sum(ra) / n
    my = sum(rb) / n
    num = sum((x - mx) * (y - my) for x, y in zip(ra, rb))
    den = math.sqrt(
        sum((x - mx) ** 2 for x in ra) * sum((y - my) ** 2 for y in rb)
    )
    return num / den


def test_spearman_matches_python_mirror(results):
    rng = random.Random(9)
    rows = []
    for _ in range(800):
        a = float(rng.randint(0, 30))  # ties on a
        b = a * 2 + rng.gauss(0, 10)
        rows.append((a, b))
    got = results["spearman"]
    assert got["n"] == 800
    assert abs(got["rho"] - _spearman_mirror(rows)) < 1e-6


def test_spearman_perfect_monotone_and_constant(results):
    assert results["sp_mono"]["rho"] == 1.0
    assert results["sp_const"]["rho"] is None


def test_hypotests_plans_are_jvm_only(spark):
    rows = [(float(i % 7), "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "v double, grp string")
    for out in (
        ks_two_sample(df, "v", "grp", "a", "b"),
        mann_whitney_u(df, "v", "grp", "a", "b"),
        chi_square_independence(df.withColumn("y", F.col("grp")), "grp", "y"),
        spearman_corr(df.withColumn("b", F.col("v") + 1), "v", "b"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
