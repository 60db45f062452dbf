"""Unit tests for integer fixed-point TextRank and HBOS anomaly scoring,
each against a plain-python mirror."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from pyspark.sql import Row

from kgforge.datapipe.profile import hbos_scores
from kgforge.datapipe.textstats import textrank_scores


def _textrank_py(text, iterations=5):
    ws = re.findall("[a-z]+", text.lower())
    words = sorted(set(ws))
    adj = set()
    for a, b in zip(ws, ws[1:]):
        if a != b:
            adj.add((min(a, b), max(a, b)))
    nbrs = defaultdict(set)
    for a, b in adj:
        nbrs[a].add(b)
        nbrs[b].add(a)
    n = len(words)
    r = {w: 1_000_000 // n for w in words}
    for _ in range(iterations):
        new = {}
        for w in words:
            csum = sum(r[u] // len(nbrs[u]) for u in nbrs[w])
            new[w] = 150_000 // n + (85 * csum) // 100
        r = new
    return {w: v / 1_000_000 for w, v in r.items()}


def test_textrank_matches_python_mirror(spark):
    text = "the quick fox jumps over the lazy dog. the fox runs"
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    got = {
        r.word: r.rank
        for r in textrank_scores(df, "doc_id", "text", 5).collect()
    }
    assert got == _textrank_py(text)
    # 'the' is the highest-degree hub -> top rank
    assert max(got, key=got.get) == "the"


def test_textrank_isolated_word_keeps_teleport_only(spark):
    # single-word doc: no edges; rank = teleport only after round 1
    df = spark.createDataFrame([Row(doc_id=1, text="solo")])
    got = textrank_scores(df, "doc_id", "text", 3).collect()
    assert len(got) == 1
    assert got[0].rank == 150_000 / 1_000_000


def test_textrank_two_docs_independent(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b"), Row(doc_id=2, text="x y z x y")]
    )
    got = defaultdict(dict)
    for r in textrank_scores(df, "doc_id", "text", 4).collect():
        got[r.id][r.word] = r.rank
    assert got[1] == _textrank_py("a b a b", 4)
    assert got[2] == _textrank_py("x y z x y", 4)


def _hbos_py(rows, bins=16):
    ids = [r[0] for r in rows]
    feats = list(zip(*[r[1:] for r in rows]))
    per_feature = []
    for vals in feats:
        lo, hi = min(vals), max(vals)
        bs = [((v - lo) * bins) // (hi - lo + 1) for v in vals]
        counts = defaultdict(int)
        for b in bs:
            counts[b] += 1
        m = max(counts.values())
        per_feature.append((bs, counts, m))
    out = {}
    for i, rid in enumerate(ids):
        s = sum(
            math.log(m / counts[bs[i]]) for bs, counts, m in per_feature
        )
        out[rid] = (
            tuple(bs[i] for bs, _, _ in per_feature),
            round(s, 6),
        )
    return out


def test_hbos_matches_python_mirror(spark):
    rows = [
        (1, 100, 5),
        (2, 110, 5),
        (3, 105, 6),
        (4, 9000, 5),  # price outlier
        (5, 102, 90),  # date outlier
    ]
    df = spark.createDataFrame(
        [Row(id=i, cents=c, day=d) for i, c, d in rows]
    )
    got = {
        r.id: ((r.cents_bin, r.day_bin), r.hbos)
        for r in hbos_scores(df, "id", ["cents", "day"], bins=16).collect()
    }
    exp = _hbos_py(rows)
    assert got == exp
    # the outliers score strictly higher than the dense cluster
    dense = max(got[i][1] for i in (1, 2, 3))
    assert got[4][1] > dense and got[5][1] > dense


def test_hbos_degenerate_feature_contributes_zero(spark):
    df = spark.createDataFrame(
        [Row(id=i, a=7, b=i) for i in range(8)]
    )
    got = hbos_scores(df, "id", ["a"], bins=16).collect()
    assert all(r.hbos == 0.0 and r.a_bin == 0 for r in got)
