"""Allen interval-algebra join: classify how two intervals relate.

Temporal reasoning over validity intervals (SCD dimensions, sensor
sessions, contract periods) needs more than "do they overlap" — Allen's
thirteen relations (1983) are the standard vocabulary.  This operator
joins two keyed interval tables and labels every INTERSECTING-OR-
MEETING pair with its Allen relation; the six disjoint before/after
pairs are deliberately not emitted (they are the quadratic complement —
derive them from the absence of a row when needed).

Scale shape: ONE equi-join on the partition key with the interval
predicate as a residual (the as-of/range-join shape Spark plans as a
hash join + filter, never a nested loop over the pair space) and a
single codegen CASE ladder for the classification.  Keys bound the
fan-out: a key's cost is its own interval count squared, never the
corpus's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def allen_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    id_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """``(key, id_a, id_b, relation)`` for every same-key pair whose
    closed intervals ``[lo, hi]`` intersect or meet.

    Relations (a vs b): ``equals, starts, started_by, finishes,
    finished_by, during, contains, overlaps, overlapped_by, meets,
    met_by``.  Intervals must satisfy lo <= hi; ids must be unique per
    side (self-pairs are excluded when both sides share ids)."""
    a = left.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id_a"),
        F.col(lo_col).alias("_alo"),
        F.col(hi_col).alias("_ahi"),
    )
    b = right.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id_b"),
        F.col(lo_col).alias("_blo"),
        F.col(hi_col).alias("_bhi"),
    )
    j = a.join(b, "key").filter(
        (F.col("id_a") != F.col("id_b"))
        & (F.col("_alo") <= F.col("_bhi"))
        & (F.col("_blo") <= F.col("_ahi"))
    )
    alo, ahi, blo, bhi = (
        F.col("_alo"),
        F.col("_ahi"),
        F.col("_blo"),
        F.col("_bhi"),
    )
    rel = (
        F.when((alo == blo) & (ahi == bhi), "equals")
        .when(ahi == blo, "meets")
        .when(bhi == alo, "met_by")
        .when((alo == blo) & (ahi < bhi), "starts")
        .when((alo == blo) & (ahi > bhi), "started_by")
        .when((ahi == bhi) & (alo > blo), "finishes")
        .when((ahi == bhi) & (alo < blo), "finished_by")
        .when((alo > blo) & (ahi < bhi), "during")
        .when((alo < blo) & (ahi > bhi), "contains")
        .when(alo < blo, "overlaps")
        .otherwise("overlapped_by")
    )
    return j.select("key", "id_a", "id_b", rel.alias("relation"))
