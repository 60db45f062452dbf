"""Unit tests for classifier evaluation and Kaplan-Meier survival."""

from __future__ import annotations

import math

from kgforge.datapipe.classify import classifier_eval
from kgforge.datapipe.timeseries import kaplan_meier


def _preds(spark, pairs):
    return spark.createDataFrame(pairs, "truth string, pred string")


def test_classifier_eval_hand_computed(spark):
    pairs = [
        ("a", "a"), ("a", "a"), ("a", "b"),
        ("b", "b"), ("b", "a"),
        ("c", "c"),
    ]
    rows = {
        r.label: r
        for r in classifier_eval(_preds(spark, pairs), "truth", "pred").collect()
    }
    a = rows["a"]
    assert (a.n_true, a.n_pred, a.tp) == (3, 3, 2)
    assert a.precision == round(2 / 3, 6) and a.recall == round(2 / 3, 6)
    assert a.f1 == round(2 / 3, 6)
    # accuracy = 4/6 everywhere
    assert all(r.accuracy == round(4 / 6, 6) for r in rows.values())
    f1s = [2 / 3, 2 * (1 / 2) * (1 / 2) / (1 / 2 + 1 / 2), 1.0]
    assert rows["a"].macro_f1 == round(sum(f1s) / 3, 6)


def test_classifier_eval_class_only_in_pred(spark):
    pairs = [("a", "a"), ("a", "z")]
    rows = {
        r.label: r
        for r in classifier_eval(_preds(spark, pairs), "truth", "pred").collect()
    }
    z = rows["z"]
    assert z.n_true == 0 and z.n_pred == 1 and z.tp == 0
    assert z.recall is None and z.precision == 0.0 and z.f1 == 0.0


def _subjects(spark, items):
    return spark.createDataFrame(items, "dur long, ev int")


def test_kaplan_meier_textbook(spark):
    # durations: deaths at 2, 4, 6; censored at 3 and 5 (n=6, one extra
    # death at 2)
    items = [(2, 1), (2, 1), (3, 0), (4, 1), (5, 0), (6, 1)]
    rows = {r.t: r for r in kaplan_meier(_subjects(spark, items), "dur", "ev").collect()}
    assert set(rows) == {2, 4, 6}
    assert rows[2].n_risk == 6 and rows[2].n_events == 2
    s2 = (6 - 2) / 6
    assert rows[2].survival == round(s2, 6)
    # at t=4: risk set = 3 (after 2 deaths + 1 censored at 3)
    assert rows[4].n_risk == 3
    s4 = s2 * (3 - 1) / 3
    assert rows[4].survival == round(s4, 6)
    # at t=6: risk set = 1
    assert rows[6].n_risk == 1
    assert rows[6].survival == round(s4 * 0.0, 6) == 0.0


def test_kaplan_meier_censored_rows_absent_but_counted(spark):
    items = [(1, 1), (2, 0), (3, 1)]
    rows = {r.t: r for r in kaplan_meier(_subjects(spark, items), "dur", "ev").collect()}
    assert set(rows) == {1, 3}
    assert rows[1].n_risk == 3
    assert rows[3].n_risk == 1
    assert rows[1].survival == round(2 / 3, 6)
    assert rows[3].survival == 0.0


def test_kaplan_meier_ties_of_death_and_censor_at_same_time(spark):
    items = [(2, 1), (2, 0), (5, 0)]
    rows = {r.t: r for r in kaplan_meier(_subjects(spark, items), "dur", "ev").collect()}
    r = rows[2]
    assert (r.n_risk, r.n_events, r.n_censored) == (3, 1, 1)
    assert r.survival == round(math.exp(math.log(2 / 3)), 6)
