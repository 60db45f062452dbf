import pytest

from kgforge.datapipe.clustereval import cluster_pairwise_eval


def _run(spark, pred, truth):
    p = spark.createDataFrame(pred, "id int, cluster string")
    t = spark.createDataFrame(truth, "id int, label string")
    r = cluster_pairwise_eval(p, t, "id").collect()[0]
    return (r["n_items"], r["tp"], r["pred_pairs"], r["true_pairs"],
            r["precision"], r["recall"], r["f1"])


def test_perfect_clustering(spark):
    pred = [(1, "a"), (2, "a"), (3, "b")]
    truth = [(1, "x"), (2, "x"), (3, "y")]
    assert _run(spark, pred, truth) == (3, 1, 1, 1, 1.0, 1.0, 1.0)


def test_known_contingency(spark):
    # pred: {1,2,3}, {4,5}; truth: {1,2}, {3,4,5}
    pred = [(1, "p1"), (2, "p1"), (3, "p1"), (4, "p2"), (5, "p2")]
    truth = [(1, "t1"), (2, "t1"), (3, "t2"), (4, "t2"), (5, "t2")]
    # TP: cell(p1,t1)=2 -> 1 pair; cell(p2,t2)=2 -> 1 pair => 2
    # pred_pairs: C(3,2)+C(2,2)=3+1=4; true_pairs: C(2,2)+C(3,2)=1+3=4
    n, tp, pp, tpp, prec, rec, f1 = _run(spark, pred, truth)
    assert (n, tp, pp, tpp) == (5, 2, 4, 4)
    assert prec == rec == 0.5 and f1 == 0.5


def test_all_singletons_gives_nulls(spark):
    pred = [(1, "a"), (2, "b")]
    truth = [(1, "x"), (2, "y")]
    n, tp, pp, tpp, prec, rec, f1 = _run(spark, pred, truth)
    assert (tp, pp, tpp) == (0, 0, 0)
    assert prec is None and rec is None and f1 is None


def test_inner_join_drops_unlabeled(spark):
    pred = [(1, "a"), (2, "a"), (9, "a")]
    truth = [(1, "x"), (2, "x")]
    n, tp, pp, tpp, prec, rec, f1 = _run(spark, pred, truth)
    assert n == 2 and tp == 1 and pp == 1 and tpp == 1
