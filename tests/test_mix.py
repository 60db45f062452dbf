"""Source-mix sampling and sequence packing semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.datapipe.mix import pack_chunks, source_mix_sample


@pytest.fixture(scope="module")
def corpus(spark):
    # skewed source sizes: a=600, b=300, c=100, d=50 (plus an untargeted e)
    rows = []
    i = 0
    for src, n in [("a", 600), ("b", 300), ("c", 100), ("d", 50), ("e", 40)]:
        for _ in range(n):
            rows.append((i, src, (i * 37) % 97 + 1))
            i += 1
    return spark.createDataFrame(rows, "id bigint, source string, n_tokens int")


def _poly(s: str, mult: int = 1000003, mod: int = 2147483647) -> int:
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % mod
    return acc


def test_mix_matches_python_mirror(spark, corpus):
    # equal targets: the scarcest targeted source (d, 50 rows) binds
    targets = dict.fromkeys("abcd", 1.0)
    out = source_mix_sample(corpus, "id", "source", targets)
    got = sorted(r["id"] for r in out.collect())

    rows = [(r["id"], r["source"]) for r in corpus.collect()]
    counts = {s: sum(1 for _, src in rows if src == s) for s in "abcd"}
    w = {s: 1.0 / 4 for s in "abcd"}
    cap = min(counts[s] / w[s] for s in "abcd")
    ppm = {s: int(min(1.0, w[s] * cap / counts[s]) * 1_000_000) for s in "abcd"}
    want = sorted(
        rid for rid, src in rows
        if src in ppm and _poly(str(rid)) % 1_000_000 < ppm[src]
    )
    assert got == want
    kept_by_src = {s: sum(1 for rid, src in rows if src == s and rid in set(got))
                   for s in "abcde"}
    assert kept_by_src["d"] == 50  # binding source kept in full
    assert kept_by_src["e"] == 0   # untargeted source dropped


def test_mix_deterministic_across_partitionings(spark, corpus):
    t = {"a": 0.5, "b": 0.3, "c": 0.2}
    ids1 = sorted(r["id"] for r in
                  source_mix_sample(corpus, "id", "source", t).collect())
    ids2 = sorted(r["id"] for r in
                  source_mix_sample(corpus.repartition(13), "id", "source", t)
                  .collect())
    assert ids1 == ids2 and len(ids1) > 0


def test_mix_validation(spark, corpus):
    with pytest.raises(ValueError):
        source_mix_sample(corpus, "id", "source", {})
    with pytest.raises(ValueError):
        source_mix_sample(corpus, "id", "source", {"a": 0.0})


def test_pack_matches_sequential_mirror(spark, corpus):
    budget = 500
    got = {r["id"]: r["pack_id"] for r in
           pack_chunks(corpus, "id", "n_tokens", budget).collect()}
    rows = sorted((r["id"], r["n_tokens"]) for r in corpus.collect())
    cum, want = 0, {}
    for rid, n in rows:
        want[rid] = cum // budget
        cum += n
    assert got == want
    # pack ids are contiguous from 0
    packs = sorted(set(got.values()))
    assert packs == list(range(len(packs)))


def test_pack_budget_straddle_bound(spark, corpus):
    budget = 500
    packed = pack_chunks(corpus, "id", "n_tokens", budget)
    sums = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("t")).collect()
    max_unit = corpus.agg(F.max("n_tokens")).collect()[0][0]
    # prefix-sum packing overfills a pack by at most one straddling unit
    for r in sums:
        assert r["t"] < budget + max_unit


def test_pack_validation(spark, corpus):
    with pytest.raises(ValueError):
        pack_chunks(corpus, "id", "n_tokens", 0)
