"""Graph table sink with snapshot lineage + checkpoint resume.

Target layout: the triple table partitioned by ``pred`` (predicate-scoped
scans prune partitions), one snapshot JSON per committed stage under
``_snapshots/`` recording row counts, per-partition lineage counters, input
fingerprint and wall time.  ``resume_or_run`` skips a stage whose snapshot
matches the input fingerprint — the resume-from-last-checkpoint contract.

If an Iceberg catalog is configured on the session the same calls go through
``writeTo(table)`` with snapshot summary properties; the sandbox image has no
Iceberg jars, so the parquet+JSON path is the default and is format-compatible
(pred-partitioned columnar files + commit metadata).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _snapshot_dir(path: str) -> str:
    return os.path.join(path, "_snapshots")


def last_snapshot(path: str) -> dict | None:
    d = _snapshot_dir(path)
    if not os.path.isdir(d):
        return None
    snaps = sorted(f for f in os.listdir(d) if f.endswith(".json"))
    if not snaps:
        return None
    with open(os.path.join(d, snaps[-1])) as f:
        return json.load(f)


def _partition_lineage(df: DataFrame) -> list[dict]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [{"pid": int(r["pid"]), "rows": int(r["count"])} for r in rows]


def write_graph(
    triples: DataFrame,
    path: str,
    *,
    stage: str,
    fingerprint: str,
    mode: str = "overwrite",
    iceberg_table: str | None = None,
) -> dict:
    """Write the triple table and commit a snapshot with lineage metrics."""
    t0 = time.time()
    lineage = _partition_lineage(triples)
    total = sum(p["rows"] for p in lineage)
    if iceberg_table is not None:
        try:
            w = triples.writeTo(iceberg_table)
            (w.createOrReplace() if mode == "overwrite" else w.append())
        except Exception as e:  # no Iceberg jars in this image — fall through
            raise RuntimeError(f"iceberg write failed ({e}); use parquet path")
    else:
        triples.write.mode(mode).partitionBy("pred").parquet(path)
    snap = {
        "stage": stage,
        "fingerprint": fingerprint,
        "rows": total,
        "partitions": lineage,
        "committed_at": time.time(),
        "write_seconds": time.time() - t0,
    }
    d = _snapshot_dir(path)
    os.makedirs(d, exist_ok=True)
    seq = len([f for f in os.listdir(d) if f.endswith(".json")])
    with open(os.path.join(d, f"{seq:06d}.json"), "w") as f:
        json.dump(snap, f, indent=1)
    return snap


def resume_or_run(
    spark: SparkSession,
    path: str,
    stage: str,
    fingerprint: str,
    build_fn,
) -> tuple[DataFrame, bool]:
    """(df, resumed): reuse the committed output when the snapshot matches."""
    snap = last_snapshot(path)
    if (
        snap is not None
        and snap.get("stage") == stage
        and snap.get("fingerprint") == fingerprint
    ):
        return spark.read.parquet(path), True
    df = build_fn()
    write_graph(df, path, stage=stage, fingerprint=fingerprint)
    return spark.read.parquet(path), False


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on ``key`` —
    the co-located-join layout: two tables bucketed the same way join with
    ZERO exchange (and with ``sort`` zero sort), because every bucket pair
    is already partition-aligned on the join key.  At 100 TB this turns the
    recurring entity⋈mentions / triples⋈triples joins from full shuffles
    into local merges; the write cost is paid once.

    Uses the session catalog (``saveAsTable`` — bucket metadata only exists
    for managed tables; plain parquet paths cannot record it)."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
