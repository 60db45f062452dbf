import random
import re

import pytest

from kgforge.datapipe.textstats import winnow_fingerprints

_MOD = 2147483647
_RADIX = 1 << 20


def _poly(s, mult=31):
    acc = 0
    for c in s:
        acc = (acc * mult + ord(c)) % _MOD
    return acc


def _winnow_py(text, k=8, w=4):
    """Mirror of winnow_fingerprints: full windows, min hash, rightmost tie."""
    norm = re.sub(r"\s+", " ", text).lower()
    n = len(norm) - k + 1
    if n < 1:
        return set()
    hs = [_poly(norm[i : i + k]) for i in range(n)]
    keys = [hs[i] * _RADIX + (_RADIX - 1 - (i + 1)) for i in range(n)]
    sel = set()
    for s in range(n - w + 1):
        kmin = min(keys[s : s + w])
        pos = _RADIX - 1 - (kmin % _RADIX)
        sel.add((pos, kmin // _RADIX))
    return sel


@pytest.mark.parametrize("seed", [1, 9])
def test_winnow_matches_python_mirror(spark, seed):
    rng = random.Random(seed)
    docs = [
        (
            i,
            " ".join(
                rng.choice(["spark", "scan", "join", "sort", "agg", "io"])
                for _ in range(rng.randrange(0, 30))
            ),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=8, w=4).collect():
        got.setdefault(r["id"], set()).add((r["fp_pos"], r["fp_hash"]))
    want = {i: _winnow_py(t) for i, t in docs if _winnow_py(t)}
    assert got == want


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length >= k + w - 1 yields a shared
    fingerprint HASH between the two documents (Schleimer et al. Thm 1)."""
    k, w = 8, 4
    shared = "the quick brown fox jumps over"  # 30 chars >= k+w-1 = 11
    docs = [
        (1, "alpha beta " + shared + " gamma delta epsilon"),
        (2, "zeta eta theta iota " + shared + " kappa"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fp = winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    hashes = {1: set(), 2: set()}
    for r in fp:
        hashes[r["id"]].add(r["fp_hash"])
    assert hashes[1] & hashes[2]


def test_winnow_short_doc_yields_nothing(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    assert winnow_fingerprints(df, "doc_id", "text", k=8, w=4).count() == 0
