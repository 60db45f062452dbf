import random

import pytest

from kgforge.datapipe.stringsim import edit_distance_join


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            a, b = min(ia, ib), max(ia, ib)
            dist = _lev(ta, tb)
            if dist <= d:
                out.add((a, b, dist))
    return out


def _run(spark, rows, d):
    df = spark.createDataFrame(rows, "id string, t string")
    got = edit_distance_join(df, "id", "t", max_dist=d).collect()
    return {(r["a"], r["b"], r["dist"]) for r in got}


WORDS = [
    "spark", "spank", "spam", "sparks", "park", "dark", "data", "date",
    "gate", "gaze", "maze", "mazes", "amaze", "grafting", "crafting",
    "drafting", "rafting", "a", "b", "ab", "", "abc",
]


def test_word_list_matches_brute_d1(spark):
    rows = [(f"w{i:02d}", w) for i, w in enumerate(WORDS)]
    assert _run(spark, rows, 1) == _brute(rows, 1)


def test_word_list_matches_brute_d2(spark):
    rows = [(f"w{i:02d}", w) for i, w in enumerate(WORDS)]
    assert _run(spark, rows, 2) == _brute(rows, 2)


def test_random_mutations_match_brute(spark):
    rng = random.Random(11)
    base = ["abcdefgh", "qrstuvwx", "mnopmnop"]
    rows = []
    n = 0
    for w in base:
        for _ in range(12):
            chars = list(w)
            op = rng.randrange(3)
            p = rng.randrange(len(chars))
            if op == 0:
                chars[p] = rng.choice("abqz")
            elif op == 1:
                chars.insert(p, rng.choice("abqz"))
            else:
                del chars[p]
            rows.append((f"m{n:03d}", "".join(chars)))
            n += 1
    assert _run(spark, rows, 1) == _brute(rows, 1)


def test_exact_duplicates_at_d0(spark):
    rows = [("x1", "same"), ("x2", "same"), ("x3", "diff"), ("x4", "")]
    assert _run(spark, rows, 0) == {("x1", "x2", 0)}


def test_insertion_shift_not_missed(spark):
    # an insertion at position 0 shifts every later segment by one —
    # the +/-d probe window must still find the verbatim segment
    rows = [("a", "0123456789"), ("b", "X0123456789")]
    assert _run(spark, rows, 1) == {("a", "b", 1)}


def test_negative_d_rejected(spark):
    df = spark.createDataFrame([("a", "x")], "id string, t string")
    with pytest.raises(ValueError):
        edit_distance_join(df, "id", "t", max_dist=-1)
