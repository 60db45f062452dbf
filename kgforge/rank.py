"""Scalable global ordering primitives.

A naive ``row_number().over(Window.orderBy(...))`` funnels the whole dataset
through one task — fatal at scale.  These helpers compute exact global ranks
with range partitioning + per-partition offsets (the zipWithIndex pattern,
kept in DataFrame/Arrow land): sort shuffle is spread over all partitions and
the only driver traffic is one count per partition.
"""

from __future__ import annotations

from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _extended_schema(df: DataFrame) -> T.StructType:
    # copy — StructType.add would mutate the DataFrame's cached schema
    return T.StructType(
        list(df.schema.fields)
        + [T.StructField("_pid", T.IntegerType()), T.StructField("_prn", T.LongType())]
    )


def with_global_rank(df: DataFrame, order_cols: list, out: str = "_rank",
                     num_partitions: int | None = None) -> DataFrame:
    """Exact 0-based global rank under ``order_cols`` without a global window.

    Plan: repartitionByRange(order_cols) → sortWithinPartitions →
    per-partition row numbers via mapInPandas (no extra shuffle) → join tiny
    per-partition offset table (broadcast).  Equal keys land in one partition,
    so add a unique tiebreaker to ``order_cols`` for determinism.
    """
    npart = num_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    d = (
        df.repartitionByRange(npart, *order_cols)
        .sortWithinPartitions(*order_cols)
    )
    schema = _extended_schema(d)

    def add_prn(it):
        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in it:
            pdf = pdf.assign(_pid=pid, _prn=range(n, n + len(pdf)))
            n += len(pdf)
            yield pdf

    d = d.mapInPandas(add_prn, schema=schema)
    d = d.persist()
    counts = {r["_pid"]: r["count"] for r in d.groupBy("_pid").count().collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], schema="_pid int, _off long"
    )
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(out, F.col("_off") + F.col("_prn"))
        .drop("_pid", "_prn", "_off")
    )


def with_global_running_sum(
    df: DataFrame, order_cols: list, value_col: str, out: str = "_runsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive global running sum of ``value_col`` under ``order_cols``
    without a single-partition window.

    Same shape as :func:`with_global_rank`: repartitionByRange →
    sortWithinPartitions → per-partition cumulative sums via mapInPandas →
    broadcast join of tiny per-partition base offsets.  Rows with equal keys
    may order arbitrarily among themselves, so the result is deterministic
    only where ``value_col`` is constant across ties or ties carry value 0 —
    exactly the contract the k-anonymity range counting needs (queries have
    weight 0, tied points are interchangeable +1s).
    """
    npart = num_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    d = (
        df.repartitionByRange(npart, *order_cols)
        .sortWithinPartitions(*order_cols)
    )
    schema = T.StructType(
        list(d.schema.fields)
        + [T.StructField("_pid", T.IntegerType()), T.StructField("_pcs", T.LongType())]
    )

    def cum(it):
        pid = TaskContext.get().partitionId()
        acc = 0
        for pdf in it:
            cs = pdf[value_col].cumsum() + acc
            if len(cs):
                acc = int(cs.iloc[-1])
            yield pdf.assign(_pid=pid, _pcs=cs)

    d = d.mapInPandas(cum, schema=schema).persist()
    totals = {
        r["_pid"]: r["t"]
        for r in d.groupBy("_pid").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], schema="_pid int, _off long"
    )
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(out, F.col("_off") + F.col("_pcs"))
        .drop("_pid", "_pcs", "_off")
    )


def with_global_index(df: DataFrame, out: str = "_idx") -> DataFrame:
    """0-based index in current partition order (zipWithIndex, Arrow path)."""
    schema = _extended_schema(df)

    def add_prn(it):
        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in it:
            pdf = pdf.assign(_pid=pid, _prn=range(n, n + len(pdf)))
            n += len(pdf)
            yield pdf

    d = df.mapInPandas(add_prn, schema=schema).persist()
    counts = {r["_pid"]: r["count"] for r in d.groupBy("_pid").count().collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], schema="_pid int, _off long"
    )
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(out, F.col("_off") + F.col("_prn"))
        .drop("_pid", "_prn", "_off")
    )
