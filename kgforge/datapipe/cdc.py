"""CDC merge: apply a changelog to a base snapshot (MERGE INTO semantics).

Given a base table and a stream of keyed change events (``op`` in
``{"I", "U", "D"}`` — upsert/upsert/delete — with a per-key sequence
column ordering the events), produce the post-merge snapshot: the LATEST
event per key wins; a surviving upsert replaces (or inserts) the row, a
delete removes it, and untouched base rows pass through.  This is the
Delta/Iceberg ``MERGE INTO`` / ``APPLY CHANGES`` primitive every
warehouse ingestion pipeline runs.

Scale shape: one per-key window over the CHANGELOG only (partitioned by
key — never single-partition; the changelog, not the base, pays the
shuffle) plus one left-anti join of the base against the touched-key
set.  The base table is never windowed or re-sorted, so a 100 TB base
with a 1 GB changelog costs one join whose build side AQE can broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_OPS = ("I", "U", "D")


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Post-merge snapshot of ``base`` under ``changes``.

    ``changes`` must carry every column of ``base`` (the full row image —
    the shape CDC feeds like Debezium emit) plus ``seq_col`` and
    ``op_col``.  Within a key, events are ordered by ``seq_col`` (ties
    would make the winner ambiguous — supply a unique sequence).  Ops:
    ``I``/``U`` both upsert (CDC streams routinely disagree on which of
    the two a first-seen key gets), ``D`` deletes.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    missing = [c for c in base.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing base columns: {missing}")
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    # op validation stays INSIDE the plan (raise_error on first bad row)
    # rather than an eager pre-scan — no extra job over the changelog
    checked_op = F.when(F.col(op_col).isin(*_OPS), F.col(op_col)).otherwise(
        F.raise_error(F.concat(F.lit("unknown op "), F.col(op_col)))
    )
    latest = (
        changes.withColumn(op_col, checked_op)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = base.join(
        latest.select(*key_cols), key_cols, "left_anti"
    )
    upserts = latest.filter(F.col(op_col) != "D").select(*base.columns)
    return survivors.unionByName(upserts)
