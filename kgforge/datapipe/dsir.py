"""Data Selection via Importance Resampling (DSIR), re-derived for Spark.

Public method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): estimate how target-like each raw document is
with a pair of bag-of-hashed-ngram models — importance log-weight

    log w(x) = Σ_gram [ ln p_target(bucket(gram)) − ln p_raw(bucket(gram)) ]

with Laplace-smoothed bucket unigram probabilities fitted on a target
sample and on the raw pool — then sample without replacement via the
Gumbel-top-k trick.  It is the standard cheap alternative to model-based
quality scoring for assembling pretraining mixes.

Spark shape (everything JVM, everything one-pass):

- featurization explodes word unigrams + bigrams and hashes them with the
  repo's order-uniform portable fold (``sketch._stage2_padded``) mod
  ``n_buckets`` — no fitted vocabulary, no Python workers;
- both bucket models are ONE map-side-combinable groupBy each (the
  feature table is ≤ ``n_buckets`` rows — kilobytes — regardless of
  corpus size, the hashing trick's point);
- scoring joins the gram stream against the BROADCAST bucket table and
  sums per doc: one combinable aggregation, no corpus-sized exchange
  beyond the per-doc sum it already needs;
- determinism: each bucket's log-ratio is frozen to exact micro-units
  (round(ln·10⁶) → int64 — the featprop fixed-point discipline), so
  per-doc sums are integer arithmetic: order-free, partition-invariant,
  and mirrored bit-for-bit by the DuckDB oracle.  Gumbel keys are
  derandomized the same way: u ∈ (0,1) from the padded two-stage hash of
  the doc id (rank-order-uniform by construction), g = −ln(−ln u) in
  micro-units.

At 100 TB: the only corpus-sized shuffles are the two bucket-count
aggregations (combinable, output ≤ n_buckets rows) and the per-doc
score sum; selection is a TakeOrdered top-k, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.datapipe.sketch import _stage2_padded
from kgforge.datapipe.textstats import _tokens

MICRO = 1_000_000
_POLY_MOD = 2147483647


def _grams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram) — word unigrams + space-joined bigrams, lowercased.
    One explode; empty/whitespace-only docs contribute nothing."""
    toks = _tokens(F.col(text_col))
    bigrams = F.expr(
        "CASE WHEN size(_t) < 2 THEN array() "
        "ELSE transform(sequence(1, size(_t) - 1), "
        "i -> concat(_t[i-1], ' ', _t[i])) END"
    )
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .select("id", F.explode(F.concat(F.col("_t"), bigrams)).alias("gram"))
        .filter(F.col("gram") != "")
    )


def _bucket(col) -> F.Column:
    return _stage2_padded(col)


def fit_bucket_model(
    grams: DataFrame, n_buckets: int
) -> DataFrame:
    """(b, n) occurrence counts per hashed bucket — the ≤``n_buckets``-row
    mergeable model artifact (counts are additive: shard models union +
    re-sum without rescanning text)."""
    return (
        grams.select((_bucket(F.col("gram")) % n_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_grams, logw_micro) for every raw document.

    ``logw_micro`` is the importance log-weight in exact micro-units
    (BIGINT): Σ over the doc's gram occurrences of
    round(10⁶·[ln p_t(b) − ln p_r(b)]) with Laplace-``alpha`` smoothing
    over ``n_buckets`` buckets.  Docs with no grams score 0.
    """
    raw_grams = _grams(raw, id_col, text_col)
    tgt_grams = _grams(target, id_col, text_col)

    cr = fit_bucket_model(raw_grams, n_buckets).withColumnRenamed("n", "nr")
    ct = fit_bucket_model(tgt_grams, n_buckets).withColumnRenamed("n", "nt")
    model = cr.join(ct, "b", "full_outer").select(
        F.coalesce("b", F.lit(0)).alias("b"),
        F.coalesce("nr", F.lit(0)).alias("nr"),
        F.coalesce("nt", F.lit(0)).alias("nt"),
    )
    totals = model.agg(
        F.sum("nr").alias("tr"), F.sum("nt").alias("tt")
    )
    a = float(alpha)
    denom = F.lit(a * n_buckets)
    scored_model = model.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            (
                F.log((F.col("nt") + F.lit(a)) / (F.col("tt") + denom))
                - F.log((F.col("nr") + F.lit(a)) / (F.col("tr") + denom))
            )
            * MICRO
        )
        .cast("bigint")
        .alias("lr_micro"),
    )

    doc_buckets = raw_grams.select(
        "id", (_bucket(F.col("gram")) % n_buckets).alias("b")
    )
    scored = doc_buckets.join(F.broadcast(scored_model), "b").groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum("lr_micro").cast("bigint").alias("logw_micro"),
    )
    ids = raw.select(F.col(id_col).alias("id")).distinct()
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("logw_micro", F.lit(0)).cast("bigint").alias("logw_micro"),
    )


def gumbel_key_micro(id_col) -> F.Column:
    """Derandomized Gumbel draw for ``id`` in micro-units:
    u = (h + 0.5) / POLY_MOD with h the padded two-stage hash of the id's
    string form (magnitude-uniform — the KMV lesson), g = −ln(−ln u)."""
    h = _stage2_padded(id_col.cast("string"))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_POLY_MOD))
    return F.round(-F.log(-F.log(u)) * MICRO).cast("bigint")


def dsir_select(
    weights: DataFrame,
    k: int,
) -> DataFrame:
    """Gumbel-top-k sampling without replacement ∝ w(x): key =
    logw_micro + gumbel_micro, take the k largest (ties broken by id).
    Plans as TakeOrderedAndProject — no global sort at scale."""
    keyed = weights.select(
        "id",
        "logw_micro",
        (F.col("logw_micro") + gumbel_key_micro(F.col("id"))).alias("key_micro"),
    )
    return keyed.orderBy(F.desc("key_micro"), F.asc("id")).limit(k)
