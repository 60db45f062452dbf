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


# -------------------------------------------------------- blocking metrics
def test_blocking_eval_hand_computed(spark):
    from kgforge.datapipe.clustereval import blocking_eval

    # entities: A has 3 records, B has 2, C has 1 (6 records)
    # blocks: A's records split 2/1; B together; C alone with A's stray
    rows = [
        ("A", "b1"), ("A", "b1"), ("A", "b2"),
        ("B", "b3"), ("B", "b3"),
        ("C", "b2"),
    ]
    df = spark.createDataFrame(rows, "ent string, blk string")
    r = blocking_eval(df, "ent", "blk").collect()[0]
    assert r.n_records == 6 and r.n_blocks == 3
    assert r.total_pairs == 15
    # candidates: C(2,2)=1 (b1) + C(2,2)=1 (b2) + C(2,2)=1 (b3) = 3
    assert r.candidate_pairs == 3
    # true: C(3,2)=3 (A) + C(2,2)=1 (B) = 4
    assert r.true_pairs == 4
    # covered: A in b1 -> 1, B in b3 -> 1
    assert r.covered_pairs == 2
    assert r.reduction_ratio == round(1 - 3 / 15, 6)
    assert r.pairs_completeness == 0.5
    assert r.pair_quality == round(2 / 3, 6)
    pc, pq = 2 / 4, 2 / 3
    assert r.f1 == round(2 * pc * pq / (pc + pq), 6)


def test_blocking_eval_perfect_blocker(spark):
    from kgforge.datapipe.clustereval import blocking_eval

    rows = [("A", "kA"), ("A", "kA"), ("B", "kB"), ("B", "kB")]
    df = spark.createDataFrame(rows, "ent string, blk string")
    r = blocking_eval(df, "ent", "blk").collect()[0]
    assert r.pairs_completeness == 1.0 and r.pair_quality == 1.0
    assert r.f1 == 1.0


def test_blocking_eval_no_true_pairs_null_pc(spark):
    from kgforge.datapipe.clustereval import blocking_eval

    rows = [("A", "k"), ("B", "k")]
    df = spark.createDataFrame(rows, "ent string, blk string")
    r = blocking_eval(df, "ent", "blk").collect()[0]
    assert r.true_pairs == 0 and r.pairs_completeness is None
    assert r.pair_quality == 0.0 and r.f1 is None
