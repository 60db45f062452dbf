"""Incremental view maintenance for distributive aggregates.

The warehouse algebra behind "don't rescan 100 TB because yesterday
changed": a published GROUP BY view holding (count, sums) per key is
maintained under a signed CDC delta — inserts carry +1, deletes −1 —
by aggregating ONLY the delta and merging partials.  COUNT and SUM are
self-maintainable (Gupta & Mumick, the classic IVM result); AVG derives
as sum/count at read time.  Groups whose maintained count reaches zero
disappear, exactly as a recompute would drop them.

Scale shape: one shuffle over the DELTA (map-side combinable groupBy),
one merge shuffle over (changed keys ∪ base keys) — the base is already
one row per key, so maintenance cost is O(|delta| + |view|), never
O(|base facts|).  At 100 TB the view is orders of magnitude smaller
than the fact table; the win is exactly that gap.  The merge is an
outer union-aggregate, not a join, so a key that exists only in the
delta (new group) or only in the base (untouched group) needs no
special casing and no null-handling hazards.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_base(
    facts: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    cnt_col: str = "cnt",
) -> DataFrame:
    """Build the maintainable view: per key, row count + per-measure sum
    (sum columns named ``sum_<measure>``).  Measures must be exact types
    (integer/decimal) for the maintained view to equal a recompute
    bit-for-bit — float sums are order-dependent."""
    aggs = [F.count(F.lit(1)).alias(cnt_col)] + [
        F.sum(m).alias(f"sum_{m}") for m in measures
    ]
    return facts.groupBy(*keys).agg(*aggs)


def merge_delta(
    base_view: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    sign_col: str = "_sign",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Maintain ``base_view`` under ``delta`` (raw fact rows + ``_sign``
    in {+1, −1}).  Returns the new view with the same schema; groups whose
    count reaches zero are dropped.  A delete for a row absent from the
    base is the caller's bug — counts would go negative, and the result
    raises at action time via an ANSI check column."""
    keys = list(keys)
    d_agg = delta.groupBy(*keys).agg(
        F.sum(sign_col).alias(cnt_col),
        *[
            F.sum(F.col(sign_col) * F.col(m)).alias(f"sum_{m}")
            for m in measures
        ],
    )
    merged = (
        base_view.select(
            *keys, cnt_col, *[f"sum_{m}" for m in measures]
        )
        .unionByName(d_agg)
        .groupBy(*keys)
        .agg(
            F.sum(cnt_col).alias(cnt_col),
            *[F.sum(f"sum_{m}").alias(f"sum_{m}") for m in measures],
        )
    )
    neg_guard = F.when(
        F.col(cnt_col) < 0,
        F.raise_error(F.lit("ivm: maintained count went negative")),
    ).otherwise(F.col(cnt_col))
    return merged.withColumn(cnt_col, neg_guard).filter(F.col(cnt_col) > 0)
