"""Small shared helpers for scale-aware operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition narrow inputs so heavy per-row work spreads across cores.

    Local testdata is a single parquet file → one input partition, which
    serializes every downstream map (explode, hashing, Arrow UDFs).  On a
    real cluster the scan already has many splits and this is a no-op — the
    repartition only fires when the plan has fewer partitions than the
    session's parallelism, so it never adds a shuffle at scale.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Plan-lineage truncation: reliable ``checkpoint`` when the session has
    a checkpoint dir configured (cluster-safe — replicated blocks survive
    executor loss), ``localCheckpoint`` otherwise (local mode)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
