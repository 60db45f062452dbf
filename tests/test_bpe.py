"""BPE merge induction + segmentation vs the classic python mirror."""

from __future__ import annotations

import pytest

from kgforge.datapipe.bpe import (
    _py_bpe,
    bpe_merges,
    bpe_segment,
    word_frequencies,
)


def _freqs(spark, d):
    return spark.createDataFrame(list(d.items()), "word string, freq bigint")


def test_textbook_example(spark):
    # the Sennrich et al. running example (no end-of-word marker)
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = [(r["rank"], r["pair"], r["merged"], r["cnt"])
           for r in bpe_merges(_freqs(spark, wf), 4).collect()]
    want_merges, _ = _py_bpe(wf, 4)
    assert got == [
        (i + 1, f"{a} {b}", a + b, c)
        for i, ((a, b), c) in enumerate(want_merges)
    ]
    # first merge must be the most frequent pair: 'es' in newest+widest (9)
    assert got[0][1] == "e s" and got[0][3] == 9


def test_matches_mirror_on_corpus_words(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ate the rat"),
         (3, "a cataract at that")],
        "id bigint, text string",
    )
    wf_df = word_frequencies(docs, "text")
    wf = {r["word"]: r["freq"] for r in wf_df.collect()}
    got = [(r["pair"], r["cnt"]) for r in bpe_merges(wf_df, 6).collect()]
    want, _ = _py_bpe(wf, 6)
    assert got == [(f"{a} {b}", c) for (a, b), c in want]


def test_overlap_counting_and_greedy_merge(spark):
    # 'aaaa': pair (a,a) counts 3 overlapping occurrences; greedy merge
    # left-to-right gives 'aa aa', then (aa,aa) merges next
    wf = {"aaaa": 1}
    rows = bpe_merges(_freqs(spark, wf), 2).collect()
    assert [(r["pair"], r["cnt"]) for r in rows] == [("a a", 3), ("aa aa", 1)]


def test_early_stop_single_chars(spark):
    wf = {"a": 3, "b": 2}
    assert bpe_merges(_freqs(spark, wf), 3).collect() == []


def test_segment_applies_merges(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges, seqs = _py_bpe(wf, 5)
    got = {
        r["word"]: list(r["tokens"])
        for r in bpe_segment(_freqs(spark, wf), [m for m, _ in merges]).collect()
    }
    assert got == seqs
