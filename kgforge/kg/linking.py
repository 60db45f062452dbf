"""Entity-link scoring: mention surfaces → catalog entities.

Candidate generation is a broadcast join of normalized surfaces against the
(tiny) entity catalog; scoring is a vectorized Arrow-batched trigram-Jaccard
UDF between the mention surface and each candidate's canonical name; the best
candidate per mention wins via a max-struct aggregation (no window over a
single partition).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.vocab import EID_TO_ENTITY, ENTITIES


def _trigrams(s: str) -> set:
    s = "^" + s.lower() + "$"
    return {s[i : i + 3] for i in range(max(len(s) - 2, 1))}


def _trigram_jaccard_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        sx, sy = _trigrams(x), _trigrams(y)
        inter = len(sx & sy)
        out.append(inter / (len(sx) + len(sy) - inter))
    return pd.Series(out, dtype="float64")


def trigram_jaccard_udf():
    # built lazily — pandas_udf("double") needs an active session to parse
    from pyspark.sql import types as T

    return F.pandas_udf(_trigram_jaccard_fn, T.DoubleType())


def candidate_table(spark) -> DataFrame:
    rows = [
        (v.lower(), e.eid, e.canonical, e.etype)
        for e in ENTITIES
        for v in e.variants
    ]
    return spark.createDataFrame(
        rows, schema="norm string, eid string, canonical string, etype string"
    )


def link_mentions(mentions: DataFrame) -> DataFrame:
    """(doc_id, span_idx, offset, surface, start) →
    (doc_id, span_idx, start, surface, eid, etype, canonical, score)."""
    spark = mentions.sparkSession
    cands = candidate_table(spark)
    m = mentions.withColumn("norm", F.lower(F.col("surface")))
    scored = (
        m.join(F.broadcast(cands), "norm", "inner")
        .withColumn("score", trigram_jaccard_udf()(F.col("surface"), F.col("canonical")))
    )
    best = (
        scored.groupBy("doc_id", "span_idx", "start")
        .agg(
            F.max(
                F.struct(
                    F.col("score"),
                    F.col("eid"),
                    F.col("etype"),
                    F.col("canonical"),
                    F.col("surface"),
                )
            ).alias("m")
        )
        .select(
            "doc_id",
            "span_idx",
            "start",
            F.col("m.surface").alias("surface"),
            F.col("m.eid").alias("eid"),
            F.col("m.etype").alias("etype"),
            F.col("m.canonical").alias("canonical"),
            F.col("m.score").alias("score"),
        )
    )
    return best
