"""Unit tests for naive-Bayes scoring and categorical mutual information,
each against a plain-python mirror."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import Row

from kgforge.datapipe.classify import naive_bayes_scores
from kgforge.datapipe.stats import mutual_information

DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the dog ran to the cat", "en"),
    (3, "der hund lief zum haus", "de"),
    (4, "die katze sitzt auf der matte", "de"),
    (5, "the cat and the dog", "en"),
]


def _nb_py():
    toks = {
        i: re.findall("[a-z]+", t.lower()) for i, t, _ in DOCS
    }
    labels = sorted({l for _, _, l in DOCS})
    vocab = {w for ws in toks.values() for w in ws}
    v, nn = len(vocab), len(DOCS)
    model = {l: Counter() for l in labels}
    nd = Counter()
    for i, _, l in DOCS:
        nd[l] += 1
        model[l].update(toks[i])
    out = {}
    for i, _, _ in DOCS:
        for l in labels:
            t = sum(model[l].values())
            s = math.log(nd[l] / nn) + sum(
                c * math.log((model[l][w] + 1) / (t + v))
                for w, c in Counter(toks[i]).items()
            )
            out[(i, l)] = round(s, 6)
    return out


def test_naive_bayes_scores_match_python(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=l) for i, t, l in DOCS]
    )
    got = {
        (r.id, r.label): r
        for r in naive_bayes_scores(df, "doc_id", "text", "lang").collect()
    }
    exp = _nb_py()
    assert set(got) == set(exp)
    for k, r in got.items():
        assert abs(r.score - exp[k]) < 2e-6, k


def test_naive_bayes_argmax_recovers_labels(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=l) for i, t, l in DOCS]
    )
    pred = {
        r.id: r.label
        for r in naive_bayes_scores(df, "doc_id", "text", "lang")
        .filter("is_pred")
        .collect()
    }
    truth = {i: l for i, _, l in DOCS}
    assert pred == truth
    # exactly one winner per doc
    assert len(pred) == len(DOCS)


def test_mutual_information_identical_columns(spark):
    df = spark.createDataFrame(
        [Row(x=i % 3, y=str(i % 3)) for i in range(30)]
    )
    r = mutual_information(df, "x", "y").collect()[0]
    # y is a bijection of x: MI == H(X) == ln 3, NMI == 1
    assert r.mi == round(math.log(3), 6)
    assert r.h_x == r.h_y == round(math.log(3), 6)
    assert r.nmi == 1.0
    assert r.cells == 3 and r.n == 30


def test_mutual_information_independent_columns(spark):
    rows = [Row(x=i % 2, y=j % 3) for i in range(2) for j in range(3)] * 5
    df = spark.createDataFrame(rows)
    r = mutual_information(df, "x", "y").collect()[0]
    assert r.mi == 0.0
    assert r.nmi == 0.0
    assert r.cells == 6


def test_mutual_information_single_category_nmi_null(spark):
    df = spark.createDataFrame([Row(x=1, y=i % 2) for i in range(10)])
    r = mutual_information(df, "x", "y").collect()[0]
    assert r.h_x == 0.0 and r.nmi is None
