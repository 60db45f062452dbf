import random
from itertools import product

import pytest

from pyspark.sql import functions as F

from kgforge.datapipe.seqmine import seq_pattern_support


def _brute_support(journeys, max_len):
    """journeys: {key: [etype, ...] in order} -> {(p1,p2[,p3]): support}."""
    types = sorted({t for seq in journeys.values() for t in seq})
    out = {}
    for pat in product(types, repeat=2):
        n = sum(1 for seq in journeys.values() if _has_subseq(seq, pat))
        if n:
            out[(pat[0], pat[1], None)] = n
    if max_len >= 3:
        for pat in product(types, repeat=3):
            n = sum(1 for seq in journeys.values() if _has_subseq(seq, pat))
            if n:
                out[pat] = n
    return out


def _has_subseq(seq, pat):
    i = 0
    for t in seq:
        if t == pat[i]:
            i += 1
            if i == len(pat):
                return True
    return False


@pytest.mark.parametrize("seed", [3, 7])
def test_seq_pattern_support_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    types = ["a", "b", "c", "d"]
    journeys = {
        k: [rng.choice(types) for _ in range(rng.randrange(0, 12))]
        for k in range(60)
    }
    rows = [
        (k, i, t)
        for k, seq in journeys.items()
        for i, t in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "user long, ord long, etype string")
    got = {
        (r["p1"], r["p2"], r["p3"]): r["support"]
        for r in seq_pattern_support(
            df, "user", "etype", [F.col("ord")], min_support=1, max_len=3
        ).collect()
    }
    assert got == _brute_support(journeys, 3)


def test_seq_pattern_repeated_symbol_needs_two_occurrences(spark):
    rows = [(1, 0, "a"), (2, 0, "a"), (2, 1, "a")]
    df = spark.createDataFrame(rows, "user long, ord long, etype string")
    got = {
        (r["p1"], r["p2"], r["p3"]): r["support"]
        for r in seq_pattern_support(
            df, "user", "etype", [F.col("ord")], min_support=1, max_len=2
        ).collect()
    }
    # <a, a> supported only by user 2 (two distinct occurrences)
    assert got == {("a", "a", None): 1}


def test_seq_pattern_min_support_filters(spark):
    rows = [(1, 0, "a"), (1, 1, "b"), (2, 0, "a"), (2, 1, "b"), (3, 0, "b")]
    df = spark.createDataFrame(rows, "user long, ord long, etype string")
    got = {
        (r["p1"], r["p2"]): r["support"]
        for r in seq_pattern_support(
            df, "user", "etype", [F.col("ord")], min_support=2, max_len=2
        ).collect()
    }
    assert got == {("a", "b"): 2}
