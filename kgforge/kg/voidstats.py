"""VoID-style dataset statistics over the canonical triple table.

The W3C VoID vocabulary's property-partition profile — the first query a
KG consumer runs against an unfamiliar graph: one row per predicate with
its triple count and distinct subject/object cardinalities, plus an
optional whole-dataset total row (pred ``*``).  Also the input the
pred-partitioned sink layout decision (``kgforge/kg/io.py``) is made from:
partition counts tell you which predicates deserve their own partitions.

Scale shape: a single groupBy(pred) with count + two count-distincts.
Exact distinct counts expand the aggregate (one shuffle per distinct
column under the hood); at 100-TB profile scale pass ``approx=True`` to
use HyperLogLog++ (``approx_count_distinct``, one pass, mergeable
sketches) — the standard trade for profiling, kept OFF by default so the
result is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def void_statistics(
    triples: DataFrame, include_total: bool = True, approx: bool = False
) -> DataFrame:
    """triples → (pred, n_triples, n_subjects, n_objects) per predicate,
    plus a ``*`` total row when ``include_total``."""
    dcount = F.approx_count_distinct if approx else F.count_distinct

    def stats(df: DataFrame, key) -> DataFrame:
        return df.groupBy(key.alias("pred")).agg(
            F.count(F.lit(1)).alias("n_triples"),
            dcount(F.col("subj")).alias("n_subjects"),
            dcount(F.col("obj_value")).alias("n_objects"),
        )

    out = stats(triples, F.col("pred"))
    if include_total:
        out = out.unionByName(stats(triples, F.lit("*")))
    return out
