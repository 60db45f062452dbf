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


def trigram_jaccard_col(df: DataFrame, a: str, b: str,
                        out: str = "score") -> DataFrame:
    """Whole-stage-codegen trigram Jaccard between two string columns —
    same values as the pandas UDF (tests assert equality), but pure JVM:
    no Python workers in the hot path, so it scales with cores instead of
    contending on 2× process pools."""
    ta, tb = f"_tri_{a}", f"_tri_{b}"
    d = df
    for col, tmp in ((a, ta), (b, tb)):
        d = d.withColumn(tmp + "_p", F.concat(F.lit("^"), F.lower(F.col(col)), F.lit("$")))
        d = d.withColumn(
            tmp,
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length({tmp}_p) - 2, 1)),"
                    f" i -> substring({tmp}_p, i, 3))"
                )
            ),
        )
    inter = F.size(F.array_intersect(F.col(ta), F.col(tb)))
    union = F.size(ta) + F.size(tb) - inter
    return d.withColumn(out, inter.cast("double") / union).drop(
        ta, tb, ta + "_p", tb + "_p"
    )


def link_mentions(mentions: DataFrame, strategy: str = "sql",
                  cands: DataFrame | None = None) -> DataFrame:
    """(doc_id, span_idx, offset, surface, start) →
    (doc_id, span_idx, start, surface, eid, etype, canonical, score).

    ``sql`` (default) scores candidates with JVM trigram-Jaccard expressions;
    ``pandas`` uses the Arrow-batched UDF — identical scores (tested).
    ``cands`` overrides the built-in demo catalog with a caller-supplied
    (norm, eid, canonical, etype) DataFrame."""
    spark = mentions.sparkSession
    if cands is None:
        cands = candidate_table(spark)
    m = mentions.withColumn("norm", F.lower(F.col("surface")))
    joined = m.join(F.broadcast(cands), "norm", "inner")
    if strategy == "sql":
        scored = trigram_jaccard_col(joined, "surface", "canonical")
    else:
        scored = joined.withColumn(
            "score", trigram_jaccard_udf()(F.col("surface"), F.col("canonical"))
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


def entity_initials(name_col) -> F.Column:
    """Word-initial letters of ``name_col``, uppercased and concatenated
    ("International Business Machines" → "IBM").  Pure JVM expression,
    mirrored verbatim in DuckDB (list_transform + first char)."""
    words = F.filter(F.split(name_col, " "), lambda w: w != F.lit(""))
    return F.upper(F.array_join(
        F.transform(words, lambda w: F.substring(w, 1, 1)), ""))


def acronym_links(
    mentions: DataFrame,
    catalog: DataFrame,
    surface_col: str = "surface",
    name_col: str = "canonical",
) -> DataFrame:
    """Initialism entity linking: an ALL-CAPS single-token mention surface
    (≥2 letters) links to catalog entities whose word-initial letters spell
    it — the classic acronym block of entity-resolution blocking schemes
    (complementary to string-similarity scoring, which never fires on
    "IBM" vs "International Business Machines": trigram Jaccard = 0).

    Scale shape: the catalog gains one derived column and broadcasts; the
    mention side is filtered to the all-caps minority BEFORE the join, so
    the equi-join is a broadcast hash join with no corpus-sized shuffle.
    Ambiguous acronyms (two entities sharing initials) produce one row per
    candidate — downstream disambiguation keeps corpus-level support.
    """
    s = F.col(surface_col)
    m = mentions.filter(
        (F.length(s) >= 2)
        & (s == F.upper(s))
        & (~s.contains(" "))
        & s.rlike("^[A-Z]+$")
    )
    cand = catalog.withColumn("_initials", entity_initials(F.col(name_col)))
    return (
        m.join(F.broadcast(cand), s == F.col("_initials"))
        .drop("_initials")
    )
