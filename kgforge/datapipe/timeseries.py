"""Time-series regularization: dense-grid gap fill + forward fill.

Sensor feeds, daily aggregates, and SCD snapshots arrive with holes; a
downstream join or window expects one row per (key, tick).  ``fill_gaps``
densifies each key's integer time axis from its first to its last
observation (fixed ``step``) and carries the last observed value forward
into the synthesized ticks — the standard ``resample().ffill()`` shape,
expressed distributively.

Scale shape: the grid is built per key with ``sequence`` + ``explode``
(distributed — each key's span explodes inside its own tasks, no driver
loop), the join back to observations is a per-key equi-join, and the
forward fill is ONE window partitioned by key (``last(ignoreNulls)``),
never a global window.  Grid size is span/step rows per key — the caller
controls the blowup by choosing the tick unit (document a day-grid, not
a millisecond-grid).  Skew: a single key's grid is proportional to its
span, not to the corpus, so hot keys cost what their history costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    step: int = 1,
) -> DataFrame:
    """One row per (key, tick) on each key's [min(ts), max(ts)] grid.

    ``ts_col`` must be integral (epoch days/hours — convert upstream).
    Output carries ``is_observed`` plus, per value column, the forward-
    filled value (observed rows keep their own).  Rows before a key's
    first observation cannot exist (the grid starts at min(ts)).
    (key, ts) must be unique — pre-aggregate duplicates upstream, a
    duplicated tick would duplicate its grid row — and with
    ``step > 1`` every observation must sit ON the grid
    (ts ≡ min(ts) mod step), or the grid join cannot reach it and it is
    silently skipped.
    """
    if step < 1:
        raise ValueError("step must be >= 1")
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    spans = df.groupBy(key_col).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
        ).alias(ts_col),
    )
    joined = grid.join(
        df.withColumn("_obs", F.lit(True)), [key_col, ts_col], "left"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c)
        for c in value_cols
    ]
    return joined.select(
        key_col,
        ts_col,
        F.coalesce(F.col("_obs"), F.lit(False)).alias("is_observed"),
        *filled,
    )
