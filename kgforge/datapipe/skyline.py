"""2-D skyline (Pareto frontier) without a global window or a pair set.

A row is on the skyline when no other row strictly dominates it
(``x' >= x`` and ``y' >= y`` with at least one strict; exact duplicates
dominate nothing and are all kept).  The classic single-machine answer is
"sort by x desc, keep rows beating the running max of y" — a global
window.  Here the same sweep is distributed:

1. one map-side-combinable groupBy collapses ties to ``ymax`` per x
   (any same-x row below its x's max is dominated by that max row);
2. the per-x table is range-partitioned on x, each partition computes
   its internal descending-x prefix max, and the cross-partition carry
   is a driver-side suffix-max over the per-partition maxima (one value
   per partition — the same offsets discipline as ``kgforge.rank``);
3. an x on the frontier joins back to the original rows with
   ``y = ymax(x)``.

Nothing is ever single-partition: the window in step 2 is per range
partition, and the driver handles exactly ``num_partitions`` scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the maximize-both Pareto frontier of
    ``(x_col, y_col)`` (to minimize a dimension, negate it upstream).
    Null coordinates are excluded — null never dominates and never
    wins."""
    spark = df.sparkSession
    npart = num_partitions or max(
        spark.sparkContext.defaultParallelism, 1
    )
    pts = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    xm = pts.groupBy(F.col(x_col).alias("_x")).agg(
        F.max(F.col(y_col)).alias("_ym")
    )
    d = (
        xm.repartitionByRange(npart, "_x")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        part_max = {
            r["_pid"]: r["_m"]
            for r in d.groupBy("_pid").agg(F.max("_ym").alias("_m")).collect()
        }
        # suffix max: the best ym in any partition holding LARGER x
        suf, acc = [], None
        for pid in sorted(part_max, reverse=True):
            suf.append((pid, acc))
            acc = part_max[pid] if acc is None else max(acc, part_max[pid])
        ym_type = dict(d.dtypes)["_ym"]
        suf_df = spark.createDataFrame(
            suf or [(0, None)], schema=f"_pid int, _suf {ym_type}"
        )
        w = (
            Window.partitionBy("_pid")
            .orderBy(F.col("_x").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        dom = F.greatest(
            F.max("_ym").over(w), F.col("_suf")
        )  # greatest() ignores nulls; null means "nothing above"
        frontier_x = (
            d.join(F.broadcast(suf_df), "_pid")
            .withColumn("_dom", dom)
            .filter(F.col("_dom").isNull() | (F.col("_dom") < F.col("_ym")))
            .select("_x", "_ym")
            .localCheckpoint(eager=True)
        )
    finally:
        d.unpersist()
    # no broadcast hint: the frontier is usually tiny but worst-case
    # (anti-correlated dims) O(n) — let AQE pick the join strategy
    return pts.join(
        frontier_x,
        (pts[x_col] == frontier_x["_x"]) & (pts[y_col] == frontier_x["_ym"]),
    ).select(*df.columns)
