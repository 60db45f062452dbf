"""Apply a PUBLISHED generalization scheme to new data.

The reference's generalization (`kgforge/anonymize/ops.py:generalize`,
AnonymizationService bucket semantics) assigns buckets by RANK over the
snapshot it anonymizes, and publishes the bucket BOUNDS (rdf:min /
rdf:max per bucket) as part of the output.  When new records arrive
later, re-running generalize would move every boundary (ranks shift) —
breaking joinability with the already-published release.  The
incremental contract is therefore: freeze the published inner
boundaries and map new values through them.

``bucket_from_bounds`` does that as a pure map-side expression: the
g−1 inner boundaries (each the midpoint between the two snapshot values
straddling a cut, exactly as published) are inlined as an array literal
and each new value's bucket is the count of boundaries strictly below
it — values beyond either end clamp to the first/last bucket by
construction, and a value exactly ON a boundary goes to the lower
bucket (documented tie rule; rank information for new data doesn't
exist, so a pure function of the value is the only consistent choice).

Scale shape: ZERO shuffles and zero joins — a broadcast-literal fold of
O(g) comparisons per row, whole-stage-codegen'd.  Classifying 100 TB of
new rows against a published scheme is a single map stage; the bounds
artifact itself is tiny (g ≈ √n buckets) and comes off the published
release, not off a rescan of the original snapshot.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def inner_boundaries(bounds: DataFrame) -> list[float]:
    """Extract the sorted inner boundaries from a published bounds table
    (bucket, bmin, bmax) as produced by the generalize pipeline: the bmax
    of every bucket except the last (equivalently the bmin of every
    bucket except the first).  Driver-side by design — the bounds table
    IS the published artifact, g rows total."""
    rows = bounds.filter(F.col("bmax").isNotNull()).select("bmax").collect()
    return sorted(float(r["bmax"]) for r in rows)


def bucket_from_bounds(
    value: Column, boundaries: Sequence[float]
) -> Column:
    """Bucket index (bigint) of ``value`` under the published inner
    ``boundaries``: count of boundaries strictly below the value.
    No boundaries = a single-bucket scheme: everything is bucket 0."""
    if not boundaries:
        return F.lit(0).cast("bigint")
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b < value)).cast("bigint")


def apply_bounds(
    df: DataFrame,
    value_col: str,
    boundaries: Sequence[float],
    out: str = "bucket",
) -> DataFrame:
    """New-data classification: ``df`` plus a ``out`` column holding each
    row's bucket under the frozen scheme.  NULL values get NULL buckets
    (they were never generalized in the original release either)."""
    v = F.col(value_col).cast("double")
    return df.withColumn(
        out, F.when(v.isNotNull(), bucket_from_bounds(v, boundaries))
    )
