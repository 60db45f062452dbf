"""Python mirrors for NDCG@k (datapipe/rankeval.py) and split-conformal
intervals (datapipe/conformal.py)."""

from __future__ import annotations

import math

import pytest

from kgforge.datapipe.conformal import split_conformal_eval
from kgforge.datapipe.rankeval import MICRO, _discount_weights, ndcg_at_k

_ROWS = [
    # group, id, score, rel
    ("q1", 1, 90, 3), ("q1", 2, 80, 0), ("q1", 3, 70, 2), ("q1", 4, 60, 1),
    ("q2", 1, 50, 0), ("q2", 2, 40, 0),            # no relevant items
    ("q3", 1, 10, 1), ("q3", 2, 10, 2),            # score tie → id asc
]


def _py_ndcg(rows, k):
    wts = _discount_weights(k)
    out = {}
    groups = sorted({g for g, *_ in rows})
    for g in groups:
        items = [(i, s, r) for gg, i, s, r in rows if gg == g]
        by_score = sorted(items, key=lambda t: (-t[1], t[0]))[:k]
        by_rel = sorted(items, key=lambda t: (-t[2], t[0]))[:k]
        dcg = sum(r * wts[p] for p, (_i, _s, r) in enumerate(by_score))
        idcg = sum(r * wts[p] for p, (_i, _s, r) in enumerate(by_rel))
        out[g] = (dcg, idcg, (dcg * MICRO) // idcg if idcg > 0 else None)
    return out


def test_ndcg_matches_python_mirror(spark):
    df = spark.createDataFrame(_ROWS, "g string, id int, score int, rel int")
    got = {
        r["g"]: (r["dcg_micro"], r["idcg_micro"], r["ndcg_ppm"])
        for r in ndcg_at_k(df, "g", "id", "score", "rel", k=3).collect()
    }
    assert got == _py_ndcg(_ROWS, 3)
    # q1: perfect first hit but imperfect order → 0 < ndcg < 1
    assert 0 < got["q1"][2] < MICRO
    # q2: no relevant items → NULL
    assert got["q2"][2] is None
    # q3: score tie broken by id → rel-2 item ranked second, not first
    assert got["q3"][2] < MICRO


def test_ndcg_perfect_ranking_is_one(spark):
    rows = [("q", i, 100 - i, 5 - i) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, id int, score int, rel int")
    got = ndcg_at_k(df, "g", "id", "score", "rel", k=5).collect()[0]
    assert got["ndcg_ppm"] == MICRO


def test_ndcg_validates_k(spark):
    df = spark.createDataFrame(_ROWS, "g string, id int, score int, rel int")
    with pytest.raises(ValueError):
        ndcg_at_k(df, "g", "id", "score", "rel", k=0)


def _py_conformal(calib, test, num, den):
    groups = sorted({g for g, _ in calib})
    out = {}
    for g in groups:
        ys = [y for gg, y in calib if gg == g]
        n = len(ys)
        pred = (sum(ys) * MICRO) // n
        res = sorted(abs(y * MICRO - pred) for y in ys)
        rank = min((((n + 1) * (den - num)) + den - 1) // den, n)
        qhat = res[rank - 1]
        ts = [y for gg, y in test if gg == g]
        cov = sum(1 for y in ts if abs(y * MICRO - pred) <= qhat)
        out[g] = (n, pred, qhat, len(ts), cov)
    return out


def test_split_conformal_matches_python_mirror(spark):
    calib_rows = [("a", v) for v in [10, 12, 14, 16, 18, 20, 22, 24, 26, 28]] + [
        ("b", v) for v in [100, 100, 101, 99, 150]]
    test_rows = [("a", 15), ("a", 40), ("a", 20), ("b", 100), ("b", 160),
                 ("c", 5)]
    calib = spark.createDataFrame(calib_rows, "g string, y int")
    test = spark.createDataFrame(test_rows, "g string, y int")
    got = {
        r["g"]: (r["n_calib"], r["pred_micro"], r["qhat_micro"],
                 r["n_test"], r["n_covered"])
        for r in split_conformal_eval(calib, test, "g", "y",
                                      alpha_num=2, alpha_den=10).collect()
    }
    assert got == _py_conformal(calib_rows, test_rows, 2, 10)
    # group only in test is dropped
    assert "c" not in got
    # the in-range test points are covered, the far one is not
    assert got["a"][4] == 2


def test_split_conformal_validates_alpha(spark):
    df = spark.createDataFrame([("a", 1)], "g string, y int")
    with pytest.raises(ValueError):
        split_conformal_eval(df, df, "g", "y", alpha_num=0, alpha_den=10)
    with pytest.raises(ValueError):
        split_conformal_eval(df, df, "g", "y", alpha_num=10, alpha_den=10)
