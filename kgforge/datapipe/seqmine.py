"""Sequential pattern mining over per-key event journeys.

Frequent subsequences (GSP/PrefixSpan semantics — Srikant & Agrawal 1996,
Pei et al. 2001, re-derived for Spark): a user supports the pattern
<a, b> when some a-event precedes some b-event in their timeline (NOT
necessarily adjacently — that is what distinguishes sequence mining from
the first-order Markov transition matrix), and supports <a, b, c> when a
b-event falls strictly between some earlier a and some later c.

The naive formulation enumerates per-user subsequences — combinatorial in
journey length and hopeless at event-log scale.  The Spark-first shape
used here rests on an existence identity over occurrence POSITIONS:

    <a, b>    supported  ⇔  min_pos(a) < max_pos(b)
    <a, b, c> supported  ⇔  ∃ b-occurrence j with min_pos(a) < j < max_pos(c)

so one map-side-combinable aggregate per (key, event_type) — first and
last position plus a count — replaces the subsequence explosion.  Pair
support is then a per-key self-join of that stats table (|keys| x |types|
rows, types being a small closed vocabulary), and triple support joins the
b-occurrence positions once against broadcast-sized (a, c) bound pairs.
Every shuffle is keyed by the journey key; nothing is ever corpus² —
the plan survives a 100x scale-up as long as the type vocabulary stays
bounded, which is the regime sequence mining is defined for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _positions(df: DataFrame, key_col: str, type_col: str,
               order_cols: list) -> DataFrame:
    """(key, etype, pos): 1-based timeline position per event — a window
    PARTITIONED by the journey key (bounded rows per key), never global."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return df.select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("etype"),
        F.row_number().over(w).alias("pos"),
    )


def seq_pattern_support(
    df: DataFrame,
    key_col: str,
    type_col: str,
    order_cols: list,
    min_support: int = 1,
    max_len: int = 3,
) -> DataFrame:
    """Support counts (number of distinct keys) for every length-2 — and,
    when ``max_len >= 3``, length-3 — pattern over the observed type
    vocabulary.  Output: (p1, p2, p3, support), ``p3`` NULL for pairs,
    filtered to ``support >= min_support``, one row per pattern.

    Repeated symbols follow subsequence semantics: <a, a> needs two
    distinct a-occurrences (min_pos < max_pos handles it for free).
    """
    if max_len not in (2, 3):
        raise ValueError("max_len must be 2 or 3")
    pos = _positions(df, key_col, type_col, order_cols)
    stats = (
        pos.groupBy("key", "etype")
        .agg(F.min("pos").alias("min_p"), F.max("pos").alias("max_p"))
    )
    a = stats.select("key", F.col("etype").alias("p1"),
                     F.col("min_p").alias("a_min"))
    b = stats.select("key", F.col("etype").alias("p2"),
                     F.col("max_p").alias("b_max"))
    pairs_per_key = a.join(b, "key").filter(F.col("a_min") < F.col("b_max"))
    pairs = (
        pairs_per_key.groupBy("p1", "p2")
        .agg(F.countDistinct("key").alias("support"))
        .withColumn("p3", F.lit(None).cast("string"))
        .select("p1", "p2", "p3", "support")
    )
    out = pairs
    if max_len >= 3:
        # (a, c) bound pairs per key, then one join against b-positions:
        # supported iff some occurrence of p2 sits strictly inside the
        # (first-a, last-c) bracket.  The bracket table is |keys| x |types|²
        # rows at most — keyed by the journey key, it co-partitions with
        # the positions table in one shuffle each.
        c = stats.select("key", F.col("etype").alias("p3c"),
                         F.col("max_p").alias("c_max"))
        brackets = a.join(c, "key").filter(F.col("a_min") + 1 < F.col("c_max"))
        mid = pos.select("key", F.col("etype").alias("p2"),
                         F.col("pos").alias("b_pos"))
        triples = (
            brackets.join(mid, "key")
            .filter((F.col("b_pos") > F.col("a_min"))
                    & (F.col("b_pos") < F.col("c_max")))
            .select("key", "p1", "p2", F.col("p3c").alias("p3"))
            .distinct()
            .groupBy("p1", "p2", "p3")
            .agg(F.countDistinct("key").alias("support"))
            .select("p1", "p2", "p3", "support")
        )
        out = pairs.unionByName(triples)
    return out.filter(F.col("support") >= F.lit(int(min_support)))
