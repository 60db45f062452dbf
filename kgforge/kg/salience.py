"""Entity-mention salience scoring.

Which entities a document is *about* — not merely mentions — is the
standard next step after mention detection in KG construction (public
formulation: Dunietz & Gillick 2014, "A new entity salience task with a
practical benchmark", whose strongest cheap features are mention
frequency and first-mention position).  This module scores exactly those
two features, kept in pure integer arithmetic so the result is
bit-reproducible across engines and partitionings:

    salience_micro = n_mentions · 10⁶
                   + ((doc_len − first_start) · 10⁶) div doc_len

i.e. one million points per mention plus an early-position bonus that
decays linearly from 10⁶ (mention at offset 0) to ~0 (mention at the end
of the document).  No floats anywhere — ``div`` is Java integer
division, mirrored by DuckDB ``//`` on BIGINT.

Scale shape: one map-side-combinable groupBy over the mention stream
(doc_id, surface), then an equi-join against the per-doc length — both
sides keyed by doc_id, AQE free to broadcast whichever is small.  The
corpus-level rollup is a second combinable aggregation keyed by surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def mention_salience(
    mentions: DataFrame,
    doc_lengths: DataFrame,
) -> DataFrame:
    """Per (doc_id, surface): ``n_mentions``, ``first_start``, and the
    integer ``salience_micro`` score.

    ``mentions``: (doc_id, surface, start) as emitted by
    :func:`kgforge.kg.mentions.detect_mentions`.
    ``doc_lengths``: (doc_id, doc_len) with doc_len ≥ 1.
    """
    per_doc = mentions.groupBy("doc_id", "surface").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_mentions"),
        F.min("start").cast("bigint").alias("first_start"),
    )
    j = per_doc.join(doc_lengths, "doc_id")
    bonus = F.expr(f"((doc_len - first_start) * {MICRO}) div doc_len")
    return j.select(
        "doc_id",
        "surface",
        "n_mentions",
        "first_start",
        F.col("doc_len").cast("bigint").alias("doc_len"),
        (F.col("n_mentions") * MICRO + bonus).cast("bigint").alias("salience_micro"),
    )


def entity_salience_rollup(per_doc_salience: DataFrame) -> DataFrame:
    """Corpus-level entity profile from the per-doc scores: supporting-doc
    count, total mentions, total salience, and the mean first-mention
    position in permille of doc length (integer ``div`` — exact).

    Requires the ``doc_len`` column to still be present (call before
    projecting it away), so the permille is length-normalized per doc."""
    d = per_doc_salience.withColumn(
        "_fp_permille", F.expr("(first_start * 1000) div doc_len")
    )
    return d.groupBy("surface").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_mentions").cast("bigint").alias("total_mentions"),
        F.sum("salience_micro").cast("bigint").alias("total_salience_micro"),
        # integer div, not float-then-cast: Spark cast(double) truncates
        # while DuckDB CAST rounds — `div` is exact on both engines
        F.expr("sum(_fp_permille) div count(*)")
        .cast("bigint")
        .alias("mean_first_permille"),
    )
