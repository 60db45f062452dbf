"""Byte-pair-encoding merge induction over a document corpus.

The tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016,
the GPT-2/SentencePiece lineage): start from character-level word
sequences, repeatedly find the most frequent adjacent token pair and merge
it, emitting the ranked merge table a tokenizer consumes.  Determinism
fixes baked in so the table is a pure function of the corpus:

- pair counts are weighted by word frequency and include overlapping
  occurrences (the classic counting rule);
- the argmax tie-break is lexicographic on the pair string (count DESC,
  pair ASC) — never hash or arrival order;
- a merge rewrites each word greedily left-to-right, non-overlapping,
  exactly once per round (the classic application rule), implemented as a
  token fold whose accumulator is the rebuilt string — the same fold runs
  verbatim as a DuckDB ``list_reduce``, which is what makes the merge
  table value-checkable cross-engine.

No end-of-word marker is appended (a documented simplification — marker
handling is a one-line change to ``_init_seq`` but would drag a
non-``[a-z]`` character through every portable regex).

Scale shape per round: one explode+groupBy over adjacent pairs (map-side
combinable — hot pairs never pin a reducer), a 1-row argmax collect (the
only driver traffic, like PageRank's convergence scalar), and one
whole-stage-codegen fold over the word table, checkpointed so plans stay
flat.  The word table is |vocab| rows, not corpus rows — BPE training cost
is bounded by vocabulary size after the initial word count, which is the
property that makes it feasible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _py_bpe(word_freqs: dict, num_merges: int):
    """Reference mirror: returns (merge table, final segmentations)."""
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        counts: dict = {}
        for w, toks in seqs.items():
            f = word_freqs[w]
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = (
                    counts.get((toks[i], toks[i + 1]), 0) + f
                )
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0] + " " + p[1]))
        merges.append((best, counts[best]))
        a, b = best
        for w, toks in seqs.items():
            out, pend = [], None
            for t in toks:
                if pend == a and t == b:
                    out.append(a + b)
                    pend = None
                elif pend is None:
                    pend = t
                else:
                    out.append(pend)
                    pend = t
            if pend is not None:
                out.append(pend)
            seqs[w] = out
    return merges, seqs


def _merge_fold(seq: Column, a: str, b: str) -> Column:
    """One greedy left-to-right non-overlapping merge of the token pair
    (a, b) over a space-separated token string — the string-accumulator
    fold (last output token is compared whole, so a freshly merged token
    can never wrongly re-merge: that would need b = '')."""
    merged = a + b
    return F.aggregate(
        F.split(seq, " "),
        F.lit(""),
        lambda acc, t: F.when(acc == "", t).when(
            (F.regexp_extract(acc, "([^ ]*)$", 1) == a) & (t == b),
            F.concat(
                acc.substr(
                    F.lit(1),
                    F.length(acc)
                    - F.length(F.regexp_extract(acc, "([^ ]*)$", 1)),
                ),
                F.lit(merged),
            ),
        ).otherwise(F.concat(acc, F.lit(" "), t)),
    )


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over lowercase ``[a-z]+`` runs — the BPE training
    input; one explode + one map-side-combinable groupBy."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit("[a-z]+"), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_merges(words: DataFrame, num_merges: int) -> DataFrame:
    """(rank, pair, merged, cnt): the ranked BPE merge table learned from a
    ``(word, freq)`` table.  Stops early when no adjacent pair remains."""
    spark = words.sparkSession
    seqs = words.select(
        F.array_join(F.split(F.col("word"), ""), " ").alias("seq"),
        F.col("freq"),
    ).localCheckpoint(eager=True)
    out = []
    for rank in range(1, num_merges + 1):
        toks = F.split(F.col("seq"), " ")
        pairs = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        best = (
            seqs.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], best[0]["cnt"]
        a, b = pair.split(" ")
        out.append((rank, pair, a + b, cnt))
        seqs = seqs.select(
            _merge_fold(F.col("seq"), a, b).alias("seq"), "freq"
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out or [], schema="rank int, pair string, merged string, cnt bigint"
    )


def bpe_segment(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, tokens): apply a learned merge list (rank order) to a word
    table — ``len(merges)`` chained folds, all whole-stage codegen."""
    seq = F.array_join(F.split(F.col("word"), ""), " ")
    for a, b in merges:
        seq = _merge_fold(seq, a, b)
    return words.select("word", F.split(seq, " ").alias("tokens"))
