"""Deduplication operators for large-scale training-data pipelines.

- exact: content-hash groupBy (one shuffle, map-side combinable)
- minhash: shingle → minhash → LSH band join → exact-Jaccard verify →
  connected components (reuses kgforge.kg.lsh / components)
- simhash: 64-bit sign-aggregated token-hash fingerprint, built entirely from
  JVM expressions (no UDF); hamming-close pairs via band join on 4×16-bit keys
- ngram-jaccard: word n-gram Jaccard near-dup detection
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.components import connected_components

# --- portable hashing ------------------------------------------------------
# Polynomial character hashes written only with fold/ascii/% so the exact
# same value is computable in other engines (DuckDB: list_reduce + ord) —
# this is what lets the driver's oracle check the hash-based dedup operators
# value-for-value instead of rows-only.

_POLY_MOD = 2147483647  # 2^31 - 1; keeps every fold step under 2^63 (ANSI)


def poly_hash(col, mult: int = 31, mod: int = _POLY_MOD):
    """(…((0*m + c1) * m + c2)… ) % mod over the characters of ``col``."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(mult) + F.ascii(c)) % F.lit(mod),
    )


def portable_token_hash62(col):
    """62-bit token hash from two independent polynomial lanes."""
    return poly_hash(col, 31) + poly_hash(col, 131) * F.lit(1 << 31).cast("long")


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(content_hash, n_dups, keep_id, dup_ids) for groups with >1 member."""
    h = df.select(F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("content_hash"))
    return (
        h.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def minhash_duplicate_clusters(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.7,
    num_hashes: int = 80, bands: int | None = None, shingle_hash=None,
    portable_bands: bool = False, shingle_mode: str = "word",
    cc_driver_threshold: int = 200_000,
) -> DataFrame:
    """(id, cluster) where cluster is the min id of the near-dup component.

    ``bands`` defaults to the threshold-matched banding (kg.lsh.pick_bands)
    so the LSH S-curve prunes sub-threshold pairs without losing recall at
    the requested Jaccard threshold.  ``shingle_mode="word"`` (3-word grams)
    is the document default — char-grams of templated prose are nearly
    identical across documents and flood the band join with candidates.
    Verified near-dup edges are usually a tiny fraction of the corpus, so
    components run on the driver below ``cc_driver_threshold`` edges (one
    job) and fall back to the distributed hash-min loop above it."""
    from kgforge.kg.lsh import (
        pairs_from_signatures,
        pick_bands,
        shingle_df,
        signatures_from_shingles,
    )
    from kgforge.util import ensure_parallelism

    if bands is None:
        bands = pick_bands(num_hashes, threshold)
    d = ensure_parallelism(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    )
    # one persisted shingle table feeds both the signature aggregation and
    # the exact-Jaccard verification (sizes + intersection) — without it the
    # explode+dedup map side runs three times
    sh = shingle_df(d, "id", "t", mode=shingle_mode).persist()
    try:
        sig = signatures_from_shingles(sh, "id", num_hashes, shingle_hash=shingle_hash)
        pairs = pairs_from_signatures(sig, "id", num_hashes, bands, portable_bands)
        verified = _verify_pairs(pairs, d, threshold, shingles=sh)
        # connected_components materializes the edge set (count action on the
        # driver path, localCheckpoint on the distributed loop), so the
        # shingle cache is fully consumed by the time it returns
        comps = connected_components(
            verified.select("a", "b"), driver_threshold=cc_driver_threshold
        )
    finally:
        sh.unpersist()
    return (
        d.select("id")
        .join(comps.withColumnRenamed("node", "id"), "id", "left")
        .withColumn("cluster", F.coalesce(F.col("comp"), F.col("id")))
        .select("id", "cluster")
    )


def _verify_pairs(pairs: DataFrame, d: DataFrame, threshold: float,
                  mode: str = "char", shingles: DataFrame | None = None) -> DataFrame:
    from kgforge.kg.lsh import shingle_df

    sh = shingles if shingles is not None else shingle_df(d, "id", "t", mode=mode)
    sizes = sh.groupBy("id").count()
    za = sizes.select(F.col("id").alias("a"), F.col("count").alias("na"))
    zb = sizes.select(F.col("id").alias("b"), F.col("count").alias("nb"))
    # size-ratio prefilter: J(a,b) <= min(|a|,|b|)/max(|a|,|b|), so pairs whose
    # sizes differ too much can never reach the threshold — prune them before
    # the (much more expensive) shingle-intersection join
    cand = (
        pairs.join(za, "a").join(zb, "b")
        .filter(
            F.least("na", "nb") >= F.lit(threshold) * F.greatest("na", "nb")
        )
    )
    sa = sh.select(F.col("id").alias("a"), "shingle")
    sb = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        cand.select("a", "b", "na", "nb")
        .join(sa, "a").join(sb, ["b", "shingle"]).groupBy("a", "b", "na", "nb")
        .count()
        .withColumnRenamed("count", "inter")
    )
    return (
        inter
        .withColumn("j", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("j") >= threshold)
        .select("a", "b")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str,
              token_hash=None, bits: int = 64) -> DataFrame:
    """(id, simhash long) — token-level simhash, pure JVM expressions.

    Each token contributes sign(bit) per bit position; the fingerprint bit is
    1 where the sum is positive.  Bits are computed with shiftright/&1 over
    the token hash and aggregated as ``bits`` sums in one shuffle.

    ``token_hash`` (Column → Column) defaults to ``xxhash64``; pass
    ``portable_token_hash62`` (with ``bits=62``) for an oracle-mirrorable
    fingerprint.  Empty tokens are dropped on every path.
    """
    from kgforge.util import ensure_parallelism

    if token_hash is None:
        token_hash = F.xxhash64
    toks = (
        ensure_parallelism(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select(
            "id",
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn("h", token_hash(F.col("tok")))
    )
    aggs = [
        F.sum(
            (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = toks.groupBy("id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("id", fp.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3, token_hash=None,
                       bits: int = 64) -> DataFrame:
    """Candidate pairs by 16-bit band equality (≤3 differing bits ⇒ at least
    one of 4 bands equal), verified by exact popcount."""
    sh = simhash64(df, id_col, text_col, token_hash=token_hash, bits=bits)
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), i * 16)
            .bitwiseAND(F.lit(0xFFFF))
            .alias("key"),
        )
        for i in range(4)
    ]
    banded = sh.select("id", "simhash", F.explode(F.array(*bands)).alias("b")).select(
        "id", "simhash", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    left = banded.select(F.col("id").alias("a"), F.col("simhash").alias("ha"), "band", "key")
    right = banded.select(F.col("id").alias("b"), F.col("simhash").alias("hb"), "band", "key")
    cand = left.join(right, ["band", "key"]).filter(F.col("a") < F.col("b"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )


def dedup_keep_best(
    df: DataFrame, id_col: str, text_col: str, score_col=None,
    threshold: float = 0.7, **minhash_kwargs,
) -> DataFrame:
    """(id, cluster, score, keep): near-dup clusters via
    :func:`minhash_duplicate_clusters`, then a retention policy — keep the
    member with the max (score, id) per cluster (ties → larger id).

    ``score_col`` defaults to ``length(text)`` (keep the longest variant,
    the common corpus-dedup policy); pass any Column (e.g. the quality
    score) to change the policy.  One groupBy on the cluster id after the
    clustering — no extra pair work."""
    clusters = minhash_duplicate_clusters(
        df, id_col, text_col, threshold=threshold, **minhash_kwargs
    )
    score = score_col if score_col is not None else F.length(F.col(text_col))
    scored = df.select(
        F.col(id_col).alias("id"), score.cast("long").alias("score")
    )
    j = clusters.join(scored, "id")
    best = j.groupBy("cluster").agg(F.max(F.struct("score", "id")).alias("b"))
    return (
        j.join(best, "cluster")
        .select(
            "id", "cluster", "score",
            ((F.col("b.score") == F.col("score")) & (F.col("b.id") == F.col("id"))).alias("keep"),
        )
    )


def _word_grams(d: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct word-n-grams per id — single source for both ngram modes so
    exact and LSH verification agree gram-for-gram."""
    toks = d.select("id", F.split(F.lower(F.col(text_col)), r"\s+").alias("toks"))
    # guard: sequence(1, 0) in Spark DESCENDS ([1, 0]) — docs with < n tokens
    # must yield an empty gram array, not out-of-range slices
    return toks.select(
        "id",
        F.explode(
            F.expr(
                f"if(size(toks) >= {n},"
                f" transform(sequence(1, size(toks)-{n - 1}),"
                f" i -> array_join(slice(toks, i, {n}), ' ')),"
                f" array())"
            )
        ).alias("g"),
    ).dropDuplicates(["id", "g"])


def _score_pairs(pairs_or_none, grams: DataFrame, threshold: float) -> DataFrame:
    """(a, b, jaccard ≥ threshold).  With ``pairs_or_none`` None the inverted
    index joins all id pairs sharing a gram; with a candidate DataFrame the
    gram join is restricted to those pairs (work = Σ|grams(a)| over
    candidates, bounded by the LSH band buckets — never all-pairs)."""
    sizes = grams.groupBy("id").count()
    ga = grams.select(F.col("id").alias("a"), "g")
    gb = grams.select(F.col("id").alias("b"), "g")
    if pairs_or_none is None:
        inter = (
            ga.join(gb, "g")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .count()
            .withColumnRenamed("count", "inter")
        )
    else:
        inter = (
            pairs_or_none.join(ga, "a")
            .join(gb, ["b", "g"])
            .groupBy("a", "b")
            .count()
            .withColumnRenamed("count", "inter")
        )
    za = sizes.select(F.col("id").alias("a"), F.col("count").alias("na"))
    zb = sizes.select(F.col("id").alias("b"), F.col("count").alias("nb"))
    return (
        inter.join(za, "a").join(zb, "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def contamination_check(eval_df: DataFrame, train_df: DataFrame,
                        id_col: str, text_col: str, n: int = 8,
                        threshold: float = 0.5) -> DataFrame:
    """(id, n_grams, n_hits, overlap, contaminated): per eval document, the
    fraction of its distinct word-n-grams that appear ANYWHERE in the train
    corpus — the standard benchmark-contamination scan.

    Corpus-level gram containment, not per-document pairing: one distinct on
    the train grams and one left-semi join.  No pair set, no hot-gram
    blow-up — scales as two shuffles regardless of how many train docs share
    a gram.  (Per-document attribution, when needed, is the ngram/LSH pair
    path.)"""
    ge = _word_grams(
        eval_df.select(F.col(id_col).alias("id"), F.col(text_col)), text_col, n
    )
    gt = _word_grams(
        train_df.select(F.col(id_col).alias("id"), F.col(text_col)), text_col, n
    ).select("g").distinct()
    sizes = ge.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        ge.join(gt, "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        sizes.join(hits, "id", "left")
        .select(
            "id",
            "n_grams",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_grams")).alias("overlap"),
        )
        .withColumn("contaminated", F.col("overlap") >= threshold)
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.6, mode: str = "exact",
                        num_hashes: int = 32, bands: int | None = None,
                        gram_hash=None, portable_bands: bool = False) -> DataFrame:
    """Word-n-gram Jaccard near-dups.

    ``mode="exact"``: all-pairs via shared-gram inverted index — exact but a
    single hot shared gram explodes the join, so it is bounded to moderate
    corpora.  ``mode="lsh"``: minhash signatures over the same grams, banded
    candidate join, exact-Jaccard verification restricted to candidates —
    the scale path; candidate volume is bounded by the band buckets even
    when every document shares one hot gram.  Banding defaults to
    kg.lsh.pick_bands(num_hashes, threshold); ``gram_hash`` /
    ``portable_bands`` make the candidate set engine-portable so a SQL
    oracle can reproduce it exactly (same trick as minhash_duplicate_clusters).
    """
    from kgforge.util import ensure_parallelism

    d = ensure_parallelism(df.select(F.col(id_col).alias("id"), F.col(text_col)))
    grams = _word_grams(d, text_col, n)
    if mode == "exact":
        return _score_pairs(None, grams, threshold)
    if mode != "lsh":
        raise ValueError(f"unknown ngram_jaccard_pairs mode: {mode!r}")
    from kgforge.kg.lsh import pairs_from_signatures, pick_bands, signatures_from_shingles

    grams = grams.persist()
    try:
        sig = signatures_from_shingles(
            grams.withColumnRenamed("g", "shingle"), "id", num_hashes,
            shingle_hash=gram_hash,
        )
        cand = pairs_from_signatures(
            sig, "id", num_hashes,
            bands if bands is not None else pick_bands(num_hashes, threshold),
            portable_bands,
        )
        out = _score_pairs(cand, grams, threshold)
        out = out.localCheckpoint(eager=True)
    finally:
        grams.unpersist()
    return out


def duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                    shingle_len: int = 40, min_count: int = 2,
                    hashed: bool = False) -> DataFrame:
    """Substring-level duplicate detection (the exact-substring dedup of
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better", re-derived for Spark): every ``shingle_len``-char window that
    occurs ≥ ``min_count`` times across the corpus (same-doc repeats
    included) marks its positions; per document, overlapping/adjacent
    marked windows merge into maximal spans (doc_id, span_start, span_end,
    n_windows), 1-based inclusive offsets.

    Scale notes: the position explode is len(text) rows per doc and (in the
    default exact mode) the global window count is one map-side-combinable
    groupBy on the window text — the shuffle is bounded by corpus bytes x 1,
    same order as a tokenization pass, and the operator is engine-portable
    and byte-exact.  The per-doc merge window partitions by doc_id (bounded
    rows), never globally.  Windows whose count clears ``min_count`` are the
    duplicated minority, so the semi-join back to positions broadcasts in
    the common case.

    ``hashed=True`` is the petabyte-scale path (the rolling-hash idea from
    Lee et al. expressed as Spark shuffles): the global count groups an
    8-byte ``xxhash64`` of each window instead of the 40-char string — a
    ~(L/8)x reduction in shuffle bytes for the one corpus-sized exchange.
    Hash collisions can only ADD candidate positions, never hide one, so
    the marked minority is then re-counted on the exact window text
    (recovered with ONE text copy per affected doc, not per position) and
    the final filter re-applies ``min_count`` on real strings — the output
    is byte-identical to the exact mode (property-tested and driven through
    the same DuckDB oracle)."""
    L = int(shingle_len)
    pos = F.explode(
        F.expr(
            f"CASE WHEN length({text_col}) >= {L} "
            f"THEN sequence(1, length({text_col}) - {L} + 1) "
            f"ELSE array() END"
        )
    ).alias("pos")
    win = F.expr(f"substring({text_col}, pos, {L})")
    if hashed:
        # fixed-width (id, pos, h) rows only — nothing string-sized crosses
        # the corpus-scale exchanges below
        positions_h = df.select(F.col(id_col).alias("id"), pos,
                                F.col(text_col)) \
            .select("id", "pos", F.xxhash64(win).alias("h"))
        dup_h = (
            positions_h.groupBy("h")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count)
            .select("h")
        )
        cand = positions_h.join(dup_h, "h", "left_semi")
        # recover exact window text for the marked minority: one text copy
        # per affected doc (collect_list is bounded by doc length, which
        # already fits in a row), then re-substring per candidate position
        cand_docs = cand.groupBy("id").agg(
            F.sort_array(F.collect_list("pos")).alias("_ps"))
        withw = (
            cand_docs.join(
                df.select(F.col(id_col).alias("id"), F.col(text_col)), "id")
            .select("id", F.explode("_ps").alias("pos"),
                    F.expr(f"substring({text_col}, pos, {L})").alias("w"))
        )
        dup_wins = (
            withw.groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count)
            .select("w")
        )
        marked = withw.join(dup_wins, "w", "left_semi").select("id", "pos")
    else:
        positions = df.select(F.col(id_col).alias("id"), pos,
                              F.col(text_col)) \
            .select("id", "pos", win.alias("w"))
        dup_wins = (
            positions.groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count)
            .select("w")
        )
        marked = positions.join(dup_wins, "w", "left_semi")

    from pyspark.sql import Window as W

    w_doc = W.partitionBy("id").orderBy("pos")
    # window ends (pos + L - 1) are monotone in pos, so a span breaks
    # exactly when this window starts beyond the previous one's end + 1
    spans = (
        marked.withColumn("_prev", F.lag("pos").over(w_doc))
        .withColumn(
            "_new",
            (F.col("_prev").isNull() | (F.col("pos") > F.col("_prev") + L))
            .cast("int"),
        )
        .withColumn("_span", F.sum("_new").over(
            w_doc.rowsBetween(W.unboundedPreceding, W.currentRow)
        ))
        .groupBy("id", "_span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("id", "span_start", "span_end", "n_windows")
    )
    return spans
