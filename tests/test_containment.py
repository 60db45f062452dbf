"""Python brute-force mirror for the asymmetric containment join
(datapipe/setsim.py:containment_join)."""

from __future__ import annotations

from fractions import Fraction

import pytest

from kgforge.datapipe.setsim import containment_join

_DOCS = [
    (1, "the quick brown fox"),
    (2, "the quick brown fox jumps over the lazy dog"),  # superset of 1
    (3, "quick brown"),                                  # subset of 1 and 2
    (4, "entirely different words here"),
    (5, "the quick brown fox"),                          # duplicate of 1
    (6, ""),
]


def _py_containment(docs, t):
    tn, td = Fraction(str(t)).limit_denominator(1_000_000).numerator, \
        Fraction(str(t)).limit_denominator(1_000_000).denominator
    sets = {i: set(x for x in txt.lower().split() if x) for i, txt in docs}
    out = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b or not sb:
                continue
            inter = len(sa & sb)
            if inter * td >= len(sa) * tn:
                out[(a, b)] = (len(sa), inter, (inter * 1_000_000) // len(sa))
    return out


@pytest.mark.parametrize("t", [1.0, 0.8, 0.5])
def test_containment_matches_brute_force(spark, t):
    df = spark.createDataFrame(_DOCS, "id int, text string")
    got = {
        (r["a"], r["b"]): (r["n_a"], r["inter"], r["containment_ppm"])
        for r in containment_join(df, "id", "text", t).collect()
    }
    assert got == _py_containment(_DOCS, t)


def test_containment_is_asymmetric(spark):
    df = spark.createDataFrame(_DOCS, "id int, text string")
    got = {(r["a"], r["b"]) for r in
           containment_join(df, "id", "text", 1.0).collect()}
    # 1 ⊆ 2 fully, 2 ⊄ 1; 3 ⊆ 1, 2, 5; exact duplicates 1↔5 both ways
    assert (1, 2) in got and (2, 1) not in got
    assert (3, 1) in got and (3, 2) in got and (3, 5) in got
    assert (1, 5) in got and (5, 1) in got


def test_containment_validates_threshold(spark):
    df = spark.createDataFrame(_DOCS, "id int, text string")
    with pytest.raises(ValueError):
        containment_join(df, "id", "text", 0.0)
