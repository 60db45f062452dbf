"""Unit mirrors for isotonic_calibrate (vs a pure-python PAV) and bh_fdr
(vs the textbook step-up procedure)."""

import random

import pytest

from kgforge.datapipe.classify import isotonic_calibrate
from kgforge.datapipe.hypotests import bh_fdr


def _py_pav(ns, ss):
    """Pool-adjacent-violators on (count, pos) bins → fitted means."""
    blocks = [[n, s] for n, s in zip(ns, ss)]  # [weight, sum]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][1] * out[-1][0] > out[-1][1] * out[-2][0]:
            n2, s2 = out.pop()
            out[-1][0] += n2
            out[-1][1] += s2
    fitted = []
    for n, s in out:
        fitted.extend([s / n] * 0)  # placeholder; expand by block weights below
    # expand: each merged block covers as many original bins as were pooled
    fitted = []
    i = 0
    for n, s in out:
        acc = 0
        while acc < n:
            acc += ns[i]
            fitted.append(s / n)
            i += 1
    return fitted


def _py_bh(ps, alpha):
    m = len(ps)
    order = sorted(range(m), key=lambda i: ps[i])
    kstar = 0
    for rank, i in enumerate(order, start=1):
        if ps[i] <= rank * alpha / m:
            kstar = rank
    if kstar == 0:
        return [False] * m
    thr = ps[order[kstar - 1]]
    return [p <= thr for p in ps]


def test_isotonic_matches_pav(spark):
    rng = random.Random(5)
    rows = []
    for g in ("a", "b"):
        for b in range(12):
            # noisy increasing trend with deliberate local violations
            base = 0.1 + 0.07 * b + (0.25 if b % 5 == 3 else 0.0) * (-1) ** b
            for _ in range(rng.randrange(3, 9)):
                rows.append((g, b, 1 if rng.random() < base else 0))
    df = spark.createDataFrame(rows, "g string, bin int, y int")
    got = {
        (r["g"], r["bin"]): (r["n"], r["pos"], r["p_iso"])
        for r in isotonic_calibrate(df, ["g"], "bin", "y").collect()
    }
    for g in ("a", "b"):
        bins = sorted({b for gg, b, _ in rows if gg == g})
        ns = [sum(1 for gg, b, _ in rows if gg == g and b == bb) for bb in bins]
        ss = [sum(y for gg, b, y in rows if gg == g and b == bb) for bb in bins]
        want = _py_pav(ns, ss)
        fitted = [got[(g, bb)][2] for bb in bins]
        for w, f in zip(want, fitted):
            assert f == pytest.approx(w, abs=1e-6)
        # monotone nondecreasing
        assert all(a <= b + 1e-9 for a, b in zip(fitted, fitted[1:]))
        # weight preserved
        for bb, nn, sss in zip(bins, ns, ss):
            assert got[(g, bb)][0] == nn and got[(g, bb)][1] == sss


def test_isotonic_already_monotone_is_identity(spark):
    rows = [("g", b, y) for b in range(5) for y in [1] * b + [0] * (5 - b)]
    df = spark.createDataFrame(rows, "g string, bin int, y int")
    got = {r["bin"]: r["p_iso"] for r in
           isotonic_calibrate(df, ["g"], "bin", "y").collect()}
    for b in range(5):
        assert got[b] == pytest.approx(b / 5, abs=1e-6)


def test_bh_fdr_grouped_matches_textbook(spark):
    rng = random.Random(9)
    rows = []
    for g in ("f1", "f2"):
        for i in range(40):
            # mix of true nulls (uniform) and signals (tiny p)
            p = rng.random() if i % 4 else rng.random() * 0.002
            rows.append((g, i, p))
    df = spark.createDataFrame(rows, "g string, id int, p double")
    got = {
        (r["g"], r["id"]): r["rejected"]
        for r in bh_fdr(df, "p", 0.1, ["g"], ["id"]).collect()
    }
    for g in ("f1", "f2"):
        sub = [(i, p) for gg, i, p in rows if gg == g]
        want = _py_bh([p for _, p in sub], 0.1)
        for (i, _), w in zip(sub, want):
            assert got[(g, i)] == w
    assert any(got.values()) and not all(got.values())


def test_bh_fdr_global_family_uses_rank_helper(spark):
    rows = [(i, (i * 37 % 100) / 100.0 + 0.001) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, p double")
    res = bh_fdr(df, "p", 0.05, None, ["id"])
    got = {r["id"]: (r["rejected"], r["i"], r["m"]) for r in res.collect()}
    want = _py_bh([p for _, p in rows], 0.05)
    for (i, _), w in zip(rows, want):
        assert got[i][0] == w
    assert all(v[2] == 100 for v in got.values())
    assert sorted(v[1] for v in got.values()) == list(range(1, 101))


def test_bh_fdr_none_rejected(spark):
    df = spark.createDataFrame(
        [("g", i, 0.5 + i / 100.0) for i in range(10)],
        "g string, id int, p double",
    )
    got = bh_fdr(df, "p", 0.05, ["g"], ["id"]).collect()
    assert all(not r["rejected"] for r in got)
