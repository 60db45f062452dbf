"""Hand-computed goldens for the round-4 additions: item-item co-purchase
recommendation, depth-2 integer-Gini CART, and WOE/IV feature profiling."""

import math

import pytest
from pyspark.sql import functions as F

from kgforge.datapipe.classify import gini_splits, gini_tree2, woe_iv
from kgforge.datapipe.recommend import copurchase_counts, copurchase_topk

BASKETS = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
           (3, "a"), (3, "c"), (4, "b"), (4, "b")]
GINI_ROWS = [("x", "p"), ("x", "p"), ("y", "n"), ("z", "n")]
TREE_ROWS = [("x", "u", "p")] * 3 + [("y", "u", "n")] * 2 + [("y", "v", "n")] * 2
WOE_ROWS = [("A", "p")] * 3 + [("A", "n")] + [("B", "p")] + [("B", "n")] * 3
FT_ROWS = [(1, "a"), (1, "b"), (1, "c"),
           (2, "a"), (2, "b"), (2, "c"),
           (3, "a"), (3, "b"), (3, "d"),
           (4, "a"), (4, "b"), (4, "c"), (4, "d")]


@pytest.fixture(scope="module")
def results(spark, pool_runner):
    """Each hand-golden computation once, concurrently; assertions stay
    per-test below (oracle-sweep pooling pattern, round-4 verdict item 3)."""
    from kgforge.datapipe.assoc import frequent_triples

    def bdf():
        return spark.createDataFrame(BASKETS, "bk int, it string")

    def fdf():
        return spark.createDataFrame(FT_ROWS, "bk int, it string")

    return pool_runner({
        "co_counts": lambda: copurchase_counts(bdf(), "bk", "it").collect(),
        "co_topk": lambda: copurchase_topk(
            bdf(), "bk", "it", k=2, min_co=2).collect(),
        "gini": lambda: gini_splits(
            spark.createDataFrame(GINI_ROWS, "f string, lab string"),
            ["f"], "lab").collect(),
        "tree": lambda: gini_tree2(
            spark.createDataFrame(TREE_ROWS, "f1 string, f2 string, lab string"),
            ["f1", "f2"], "lab").collect(),
        "woe": lambda: woe_iv(
            spark.createDataFrame(WOE_ROWS, "seg string, lab string"),
            "seg", "lab", "p").collect(),
        "ft3": lambda: frequent_triples(fdf(), "bk", "it", min_count=3).collect(),
        "ft2": lambda: frequent_triples(fdf(), "bk", "it", min_count=2).collect(),
    })


def test_copurchase_counts_and_scores(results):
    # baskets: (1: a,b,c) (2: a,b) (3: a,c) (4: b only, twice -> distinct)
    co = {(r["item_a"], r["item_b"]): r["co_n"] for r in results["co_counts"]}
    assert co == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1}
    # n(a)=3 n(b)=3 n(c)=2; min_co=2 keeps ab and ac
    top = {(r["item"], r["rec"]): (r["co_n"], r["cos2_ppm"], r["rank"])
           for r in results["co_topk"]}
    # cos2(a,b) = 4*1e6 // 9 = 444444 ; cos2(a,c) = 4*1e6 // 6 = 666666
    assert top[("a", "c")] == (2, 666666, 1)
    assert top[("a", "b")] == (2, 444444, 2)
    assert top[("c", "a")] == (2, 666666, 1)
    assert top[("b", "a")] == (2, 444444, 1)


def test_gini_splits_hand_case(results):
    # f=x splits perfectly: x rows all 'p' (2), non-x all 'n' (2)
    got = {(r["feat"], r["value"]): (r["n_left"], r["score_micro"])
           for r in results["gini"]}
    # split on x: left (2p) pure -> 0 ; right (2n) pure -> 0
    assert got[("f", "x")] == (2, 0)
    # split on y: left (1n) pure 0 ; right (2p,1n): (9-5)*1e6//3 = 1333333
    assert got[("f", "y")] == (1, 1333333)
    assert got[("f", "z")] == (1, 1333333)


def test_gini_tree2_shape_and_purity(results):
    # two features; f1 perfectly separates, f2 is noise
    out = {r["node"]: r for r in results["tree"]}
    assert set(out) == {"root", "L", "R", "LL", "LR", "RL", "RR"}
    assert (out["root"]["feat"], out["root"]["value"]) == ("f1", "x")
    assert out["root"]["score_micro"] == 0
    assert out["root"]["n"] == 7
    assert out["L"]["n"] == 3 and out["R"]["n"] == 4
    # leaves under L: all 'p'; under R: all 'n'
    for leaf in ("LL", "LR"):
        assert out[leaf]["majority_cls"] in ("p", None)
    total_leaf_n = sum(out[k]["n"] for k in ("LL", "LR", "RL", "RR"))
    assert total_leaf_n == 7
    maj = {k: out[k]["majority_cls"] for k in ("LL", "LR", "RL", "RR")
           if out[k]["n"] > 0}
    assert all(v in ("p", "n") for v in maj.values())


def test_woe_iv_hand_case(results):
    # seg A: 3 pos 1 neg ; seg B: 1 pos 3 neg ; P=4 N=4
    got = {r["value"]: r for r in results["woe"]}
    woe_a = round(math.log((2 * 3 + 1) * 4 / ((2 * 1 + 1) * 4)), 6)
    assert got["A"]["woe"] == woe_a
    iv_a = round(((3 * 4 - 1 * 4) / 16) * woe_a, 9)
    assert got["A"]["iv_term"] == iv_a
    # symmetric case
    assert got["B"]["woe"] == -woe_a
    assert got["B"]["iv_term"] == iv_a  # (1*4-3*4)/16 * (-woe) = +


def test_frequent_triples_hand_case(results):
    # baskets: {a,b,c} ×2, {a,b,d}, {a,b,c,d}
    got = {(r["a"], r["b"], r["c"]): r["n_abc"] for r in results["ft3"]}
    assert got == {("a", "b", "c"): 3}
    # min_count prunes items globally first: 'd' (support 2) can never
    # appear with min_count=3; with min_count=2 it can
    got2 = {(r["a"], r["b"], r["c"]): r["n_abc"] for r in results["ft2"]}
    assert got2[("a", "b", "d")] == 2 and got2[("a", "b", "c")] == 3
