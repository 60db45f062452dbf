"""PII scrubbing and document chunking — corpus-preparation operators.

Both are pure JVM expression pipelines (regexp / sequence+slice), so they
run inside whole-stage codegen and are engine-portable: the driver's DuckDB
oracles reproduce every replacement and every chunk boundary exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: applied first-to-last; patterns are RE2/Java-regex-safe AND
# DuckDB-regex-safe (no lookaround), so oracles can mirror them verbatim.
# The greedy phone pattern runs LAST — it would otherwise swallow the digit
# runs inside IBANs (and order is part of the operator contract: each
# pattern's count sees the previous patterns' placeholders).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("iban", r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b", "<IBAN>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
)


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, scrubbed, n_email, n_phone, n_ipv4, n_iban): redact PII spans
    with typed placeholders and count replacements per category.

    Counts are computed on the ORIGINAL text per category-in-sequence (the
    count for a later pattern sees earlier placeholders, mirroring the
    sequential replacement semantics exactly)."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        counts.append(n.cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(
        F.col(id_col).alias("id"),
        cur.alias("scrubbed"),
        *counts,
    )


def dedup_lines(df: DataFrame, id_col: str, text_col: str,
                sep: str = "\n") -> DataFrame:
    """(id, cleaned, n_lines, n_removed): drop repeated lines WITHIN each
    document, keeping first occurrences in order (the Gopher/RefinedWeb-style
    intra-document repetition filter).

    Pure JVM: split → positional explode → min(pos) per distinct line →
    re-assemble sorted by first position.  One shuffle keyed by (id, line) —
    boilerplate-heavy corpora (headers, nav bars, templated footers) shrink
    before any cross-document dedup runs."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    firsts = lines.groupBy("id", "line").agg(F.min("pos").alias("pos"))
    total = lines.groupBy("id").agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = (
        firsts.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("cleaned"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return (
        rebuilt.join(total, "id")
        .select(
            "id", "cleaned",
            F.col("n_lines").cast("long").alias("n_lines"),
            (F.col("n_lines") - F.col("n_kept")).cast("long").alias("n_removed"),
        )
    )


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 64, overlap: int = 8) -> DataFrame:
    """(id, chunk_idx, chunk, n_tokens): split each document into
    whitespace-token windows of ``chunk_tokens`` with ``overlap`` tokens of
    context carried between consecutive chunks (the standard LLM-training
    chunking shape).  Chunk starts are 0, S, 2S, … with stride
    S = chunk_tokens − overlap; the final chunk may be short; an empty or
    whitespace-only document yields no chunks.

    Pure sequence/slice expressions — one explode, no Python workers; a
    100 TB corpus chunks in a single map stage."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = df.select(
        F.col(id_col).alias("id"),
        F.filter(toks, lambda t: t != "").alias("_toks"),
    )
    # chunk starts: 1, 1+S, 1+2S, ... (1-based for slice); n_chunks =
    # ceil(max(n - overlap, 1) / stride) for n > 0
    starts = F.expr(
        f"if(size(_toks) = 0, array(),"
        f" transform(sequence(1, cast(ceil(greatest(size(_toks) - {overlap}, 1)"
        f" / CAST({stride} AS DOUBLE)) AS INT)),"
        f" i -> (i - 1) * {stride} + 1))"
    )
    chunks = d.select(
        "id",
        "_toks",
        F.posexplode(starts).alias("chunk_idx", "_start"),
    ).select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("_start"), F.lit(chunk_tokens)), " "
        ).alias("chunk"),
        F.least(
            F.size("_toks") - F.col("_start") + 1, F.lit(chunk_tokens)
        ).cast("long").alias("n_tokens"),
    )
    return chunks


# RE2/Java- AND DuckDB-safe (no lookaround); host group 1 isolates the domain
URL_PATTERN = r"https?://([a-z0-9.-]+)(/[^\s]*)?"


def extract_urls(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, url, domain) — one row per URL occurrence, JVM regex only.

    The domain column feeds the standard curation moves: per-domain corpus
    composition stats, domain blocklist/allowlist filters (an anti-join or
    broadcast semi-join on ``domain``), and per-domain dedup keys.
    """
    # DataFrame-API regexp (NOT F.expr): a single-quoted SQL literal would
    # escape-process the pattern's backslashes and corrupt \s
    urls = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0))
        ).alias("url"),
    )
    return urls.withColumn(
        "domain", F.regexp_extract("url", URL_PATTERN, 1)
    )


# tracking params the canonicalizer strips (anchored; portable to DuckDB's
# regexp_matches — no lookaround, no escape-processed classes)
_TRACKING_PARAM = r"^(utm_[^=]*|gclid|fbclid|ref|mc_cid|mc_eid)(=.*)?$"


def canonicalize_url(col) -> "F.Column":
    """URL column → canonical form: lowercased scheme and host, default
    port stripped (:80 for http, :443 for https), empty path → ``/``,
    tracking query params removed (``utm_*``, ``gclid``, ``fbclid``,
    ``ref``, ``mc_cid``, ``mc_eid``) with the remaining params kept in
    their original order, fragment dropped.  The CommonCrawl/C4-style URL
    dedup key.

    Pure JVM regex + array expressions (whole-stage codegen, no Python);
    every pattern avoids lookaround and escape-processed classes so the
    DuckDB oracle runs the identical regexes.  Userinfo and IDN/percent
    normalization are deliberately out of scope (they need a real URL
    parser; at ingest scale that belongs in the decoder)."""
    scheme = F.lower(F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(
        col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(col, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(_TRACKING_PARAM),
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """(canonical, n_urls, n_raw_forms, keep_id): URL-level dedup groups
    under :func:`canonicalize_url` — ``n_raw_forms`` counts the distinct
    raw spellings that collapsed, ``keep_id`` is the deterministic survivor
    (min id).  One map-side-combinable groupBy; scale-safe."""
    c = df.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        canonicalize_url(F.col(url_col)).alias("canonical"),
    )
    return c.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("url").alias("n_raw_forms"),
        F.min("id").alias("keep_id"),
    )


def normalize_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, normalized, n_controls, n_ws_runs): strip C0/DEL control
    characters (tab/newline become spaces first, so word boundaries
    survive), collapse whitespace runs to one space, and trim — the
    standard pre-tokenization cleanup.  Pure JVM regexp chain; counts are
    taken on the original text so the operator doubles as a corpus-noise
    profiler.  (Unicode NFC is deliberately NOT done here: Spark has no
    built-in normalizer, and a per-row Python UDF in this hot path would be
    a 10-100x regression — at scale NFC belongs in the ingest decoder.)"""
    t = F.col(text_col)
    controls = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
    squeezed = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(t, r"[\t\n\r]", " "), controls, ""),
        r" {2,}", " ",
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.trim(squeezed).alias("normalized"),
        (F.size(F.split(t, controls)) - F.lit(1)).cast("long").alias("n_controls"),
        (F.size(F.split(t, r" {2,}")) - F.lit(1)).cast("long").alias("n_ws_runs"),
    )
