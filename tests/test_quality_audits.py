"""Unit tests for the data-quality audit operators: referential-orphan
scan, Benford first-digit audit, and Flesch readability scoring."""

from __future__ import annotations

import math

from pyspark.sql import Row

from kgforge.datapipe.profile import benford_digits, fk_orphans
from kgforge.datapipe.textstats import readability_scores


def test_fk_orphans_counts(spark):
    child = spark.createDataFrame(
        [Row(k=1), Row(k=2), Row(k=2), Row(k=9), Row(k=None), Row(k=None)]
    )
    parent = spark.createDataFrame([Row(p=1), Row(p=2), Row(p=2)])
    out = fk_orphans([("child.k->parent", child, "k", parent, "p")]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.fk_name == "child.k->parent"
    assert r.child_rows == 6
    # NULL FKs are counted but are NOT violations
    assert r.null_keys == 2
    assert r.orphan_rows == 1 and r.orphan_keys == 1


def test_fk_orphans_clean_constraint(spark):
    child = spark.createDataFrame([Row(k=1), Row(k=1)])
    parent = spark.createDataFrame([Row(p=1), Row(p=2)])
    r = fk_orphans([("c", child, "k", parent, "p")]).collect()[0]
    assert (r.orphan_rows, r.orphan_keys, r.null_keys) == (0, 0, 0)


def test_fk_orphans_multiple_constraints(spark):
    a = spark.createDataFrame([Row(k=1), Row(k=3)])
    b = spark.createDataFrame([Row(k=5)])
    p = spark.createDataFrame([Row(p=1), Row(p=5)])
    out = {
        r.fk_name: r
        for r in fk_orphans(
            [("a", a, "k", p, "p"), ("b", b, "k", p, "p")]
        ).collect()
    }
    assert out["a"].orphan_rows == 1
    assert out["b"].orphan_rows == 0


def test_benford_digits_exact_counts(spark):
    # values: first digits 1,1,2,9 — zero/negatives excluded
    df = spark.createDataFrame(
        [Row(v=123), Row(v=19), Row(v=250), Row(v=900), Row(v=0), Row(v=-40)]
    )
    rows = {r.digit: r for r in benford_digits(df, "v").collect()}
    assert set(rows) == {1, 2, 9}
    assert rows[1].n == 2 and rows[2].n == 1 and rows[9].n == 1
    assert rows[1].share == 0.5
    assert rows[1].benford_share == round(math.log10(2), 6)
    assert rows[9].excess == round(0.25 - math.log10(1 + 1.0 / 9), 6)


def test_benford_first_digit_is_string_exact(spark):
    # 10^15 is exactly representable; string head must read '1', never a
    # float-log10 boundary artifact
    df = spark.createDataFrame([Row(v=10**15), Row(v=999_999_999_999_999)])
    rows = {r.digit: r.n for r in benford_digits(df, "v").collect()}
    assert rows == {1: 1, 9: 1}


def test_readability_hand_computed(spark):
    # "the cat sat. it ran!" → words 5, sentences 2, vowel groups:
    # e,a,a,i,a → 5
    df = spark.createDataFrame([Row(id=1, t="The cat sat. It ran!")])
    r = readability_scores(df, "id", "t").collect()[0]
    assert (r.n_words, r.n_sents, r.n_syll) == (5, 2, 5)
    expected = round(206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5), 6)
    assert r.flesch == expected


def test_readability_no_sentence_marks_floor(spark):
    df = spark.createDataFrame([Row(id=1, t="just a fragment")])
    r = readability_scores(df, "id", "t").collect()[0]
    assert r.n_sents == 1
    assert r.n_words == 3


def test_readability_empty_text_guard(spark):
    df = spark.createDataFrame([Row(id=1, t="")])
    r = readability_scores(df, "id", "t").collect()[0]
    assert (r.n_words, r.n_sents, r.n_syll) == (0, 1, 0)
    # words=0 → spw denominator floors at 1 → score is finite
    assert r.flesch == round(206.835 - 0.0 - 0.0, 6)
