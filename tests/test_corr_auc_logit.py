"""Unit mirrors for corr_matrix (Pearson from exact moments), roc_auc
(tie-corrected rank AUC), and the logistic IRLS fit + codegen scorer."""

import math
import random

import pytest

from kgforge.datapipe.classify import (
    logistic_fit_numpy,
    logistic_predict,
    roc_auc,
)
from kgforge.datapipe.stats import corr_matrix


def _py_pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return (n * sxy - sx * sy) / math.sqrt(vx * vy)


def _py_auc(pairs):
    """P(score_pos > score_neg) + 0.5 P(=) by direct pair counting."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    if not pos or not neg:
        return None
    num = 0.0
    for p in pos:
        for q in neg:
            num += 1.0 if p > q else (0.5 if p == q else 0.0)
    return num / (len(pos) * len(neg))


def test_corr_matrix_matches_pair_mirror(spark):
    rng = random.Random(7)
    rows = []
    for g in ("a", "b"):
        for _ in range(40):
            x = rng.randrange(-50, 50)
            rows.append((g, x, 3 * x + rng.randrange(-10, 10),
                         rng.randrange(0, 100)))
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint, z bigint")
    got = {
        (r["g"], r["col_x"], r["col_y"]): (r["n"], r["r"])
        for r in corr_matrix(df, ["g"], ["x", "y", "z"]).collect()
    }
    assert len(got) == 6  # 2 groups x 3 pairs
    for g in ("a", "b"):
        sub = [r for r in rows if r[0] == g]
        for i, j, cx, cy in ((1, 2, "x", "y"), (1, 3, "x", "z"), (2, 3, "y", "z")):
            want = _py_pearson([r[i] for r in sub], [r[j] for r in sub])
            n, r = got[(g, cx, cy)]
            assert n == len(sub)
            assert r == pytest.approx(want, abs=1e-6)
    # strong positive linear relation must show up
    assert got[("a", "x", "y")][1] > 0.9


def test_corr_matrix_constant_column_is_null(spark):
    df = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 5), ("g", 3, 5)], "g string, x bigint, c bigint"
    )
    [row] = corr_matrix(df, ["g"], ["x", "c"]).collect()
    assert row["r"] is None and row["n"] == 3


def test_roc_auc_matches_pair_counting_with_ties(spark):
    rng = random.Random(11)
    rows = [
        (g, rng.randrange(0, 2), float(rng.randrange(0, 8)))  # many ties
        for g in ("s1", "s2")
        for _ in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, y int, s double")
    got = {r["g"]: r for r in roc_auc(df, "y", "s", ["g"]).collect()}
    for g in ("s1", "s2"):
        sub = [(y, s) for gg, y, s in rows if gg == g]
        want = _py_auc(sub)
        assert got[g]["auc"] == pytest.approx(want, abs=1e-6)
        assert got[g]["n_pos"] == sum(y for y, _ in sub)
        assert got[g]["n_neg"] == len(sub) - got[g]["n_pos"]


def test_roc_auc_degenerate_group_null(spark):
    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 1, 2.0)], "g string, y int, s double"
    )
    [row] = roc_auc(df, "y", "s", ["g"]).collect()
    assert row["auc"] is None and row["n_neg"] == 0


def test_roc_auc_perfect_separation(spark):
    df = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 0, 2.0), ("g", 1, 3.0), ("g", 1, 4.0)],
        "g string, y int, s double",
    )
    [row] = roc_auc(df, "y", "s", ["g"]).collect()
    assert row["auc"] == 1.0


def test_logistic_fit_deterministic_and_learns(spark):
    rng = random.Random(3)
    x, y = [], []
    for _ in range(300):
        a = rng.uniform(-2, 2)
        b = rng.uniform(-2, 2)
        logit = 1.5 * a - 2.0 * b + 0.3
        p = 1.0 / (1.0 + math.exp(-logit))
        x.append([a, b])
        y.append(1 if rng.random() < p else 0)
    beta1 = logistic_fit_numpy(x, y)
    beta2 = logistic_fit_numpy(x, y)
    assert beta1 == beta2  # bit-identical rerun
    # signs recovered, magnitudes in a sane band
    assert beta1[1] > 0.5 and beta1[2] < -0.8
    # log-loss of the fit beats the constant-0.5 predictor
    def loss(beta):
        t = 0.0
        for (a, b), yy in zip(x, y):
            eta = beta[0] + beta[1] * a + beta[2] * b
            p = 1.0 / (1.0 + math.exp(-eta))
            p = min(max(p, 1e-12), 1 - 1e-12)
            t -= yy * math.log(p) + (1 - yy) * math.log(1 - p)
        return t / len(x)
    assert loss(beta1) < loss([0.0, 0.0, 0.0]) - 0.05

    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(x)],
        "id int, f1 double, f2 double",
    )
    got = {
        r["id"]: r["p"]
        for r in logistic_predict(df, ["f1", "f2"], beta1).collect()
    }
    for i, (a, b) in enumerate(x[:25]):
        eta = beta1[0] + beta1[1] * a + beta1[2] * b
        want = 1.0 / (1.0 + math.exp(-eta))
        assert got[i] == pytest.approx(want, abs=1e-6)
