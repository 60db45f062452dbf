"""Unit tests for k-NN classification and seeded label spreading."""

from __future__ import annotations

from pyspark.sql import Row

from kgforge.datapipe.classify import knn_classify
from kgforge.kg.labelspread import label_spread


def test_knn_classify_separable_clusters(spark):
    # two well-separated directions in 2-d
    train = spark.createDataFrame(
        [
            Row(id=1, v=[1.0, 0.0], lab="x"),
            Row(id=2, v=[0.9, 0.1], lab="x"),
            Row(id=3, v=[1.0, 0.1], lab="x"),
            Row(id=4, v=[0.0, 1.0], lab="y"),
            Row(id=5, v=[0.1, 0.9], lab="y"),
            Row(id=6, v=[0.1, 1.0], lab="y"),
        ]
    )
    test = spark.createDataFrame(
        [Row(id=10, v=[0.95, 0.05], lab="?"), Row(id=11, v=[0.05, 0.95], lab="?")]
    )
    got = {
        r.id: (r.pred_label, r.votes)
        for r in knn_classify(train, test, "id", "v", "lab", k=3).collect()
    }
    assert got == {10: ("x", 3), 11: ("y", 3)}


def test_knn_classify_vote_tiebreak_label_asc(spark):
    # k=2 with one neighbor of each label at identical cosine:
    # tie broken by label ASC
    train = spark.createDataFrame(
        [
            Row(id=1, v=[1.0, 0.0], lab="b"),
            Row(id=2, v=[0.0, 1.0], lab="a"),
        ]
    )
    test = spark.createDataFrame([Row(id=9, v=[1.0, 1.0], lab="?")])
    r = knn_classify(train, test, "id", "v", "lab", k=2).collect()[0]
    assert r.pred_label == "a" and r.votes == 1


def _ls_edges(spark, pairs):
    return spark.createDataFrame([Row(a=a, b=b) for a, b in pairs])


def _ls_seeds(spark, items):
    return spark.createDataFrame(
        [Row(node=n, label=l) for n, l in items]
    )


def test_label_spread_path_horizon(spark):
    # seed 0 -> chain 0-1-2-3; 3 rounds reach node 3
    e = _ls_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    s = _ls_seeds(spark, [(0, "red")])
    got = {
        r.node: (r.label, r.is_seed)
        for r in label_spread(e, s, src="a", dst="b", rounds=3).collect()
    }
    assert got[0] == ("red", True)
    assert got[1] == ("red", False)
    assert got[3] == ("red", False)
    # 4 is 4 hops away -> unreached
    assert got[4] == (None, False)


def test_label_spread_majority_and_tiebreak(spark):
    # node 9 has two 'blue' neighbors and one 'red' -> blue;
    # node 8 has one of each -> tie -> label ASC ('blue' < 'red')
    e = _ls_edges(
        spark, [(9, 1), (9, 2), (9, 3), (8, 1), (8, 4)]
    )
    s = _ls_seeds(spark, [(1, "blue"), (2, "blue"), (3, "red"), (4, "red")])
    got = {
        r.node: r.label
        for r in label_spread(e, s, src="a", dst="b", rounds=1).collect()
    }
    assert got[9] == "blue"
    assert got[8] == "blue"


def test_label_spread_seeds_clamped(spark):
    # seed 1 is surrounded by 'red' neighbors but keeps its own label
    e = _ls_edges(spark, [(1, 2), (1, 3)])
    s = _ls_seeds(spark, [(1, "blue"), (2, "red"), (3, "red")])
    got = {
        r.node: (r.label, r.is_seed)
        for r in label_spread(e, s, src="a", dst="b", rounds=2).collect()
    }
    assert got[1] == ("blue", True)


def test_label_spread_recomputes_each_round(spark):
    # node 5's only neighbor is non-seed 6, which adopts from seed 7:
    # round 1 labels 6, round 2 labels 5 THROUGH 6's adopted label
    e = _ls_edges(spark, [(7, 6), (6, 5)])
    s = _ls_seeds(spark, [(7, "g")])
    got = {
        r.node: r.label
        for r in label_spread(e, s, src="a", dst="b", rounds=2).collect()
    }
    assert got[6] == "g" and got[5] == "g"
