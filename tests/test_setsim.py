import itertools

import pytest

from kgforge.datapipe.setsim import set_similarity_join


def _mirror(docs, t):
    sets = {i: set(s.lower().strip().split(" ")) - {""} for i, s in docs}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            out[(a, b)] = (inter, union, round(inter / union, 6))
    return out


def _run(spark, docs, t):
    df = spark.createDataFrame(docs, "id int, text string")
    got = set_similarity_join(df, "id", "text", t).collect()
    return {(r["a"], r["b"]): (r["inter"], r["union_n"], r["jaccard"])
            for r in got}


DOCS = [
    (1, "the quick brown fox jumps"),
    (2, "the quick brown fox leaps"),
    (3, "a quick brown dog"),
    (4, "entirely different words here"),
    (5, "the quick brown fox jumps"),     # exact duplicate of 1
    (6, "fox"),
]


def test_exact_against_naive_mirror(spark):
    for t in (0.3, 0.5, 0.8, 1.0):
        assert _run(spark, DOCS, t) == _mirror(DOCS, t), t


def test_duplicate_tokens_collapse_to_set(spark):
    docs = [(1, "x x x y"), (2, "x y y")]
    assert _run(spark, docs, 0.9) == {(1, 2): (2, 2, 1.0)}


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id int, text string")
    with pytest.raises(ValueError):
        set_similarity_join(df, "id", "text", 0.0)
    with pytest.raises(ValueError):
        set_similarity_join(df, "id", "text", 1.1)
