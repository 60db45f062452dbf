"""Instance-based schema matching: align columns of two tables by value
overlap.

The classic data-integration step (COMA++ / Rahm & Bernstein's matcher
survey, VLDB J. 2001; "instance-based matchers"): two tables arriving
from different sources rarely share column names, but key and category
columns share *values* — so estimate pairwise value-set Jaccard between
all cross-table column pairs and pick the best partner per column.

Spark shape, built on the repo's KMV machinery (`datapipe/sketch.py`):

- ``melt_columns`` unpivots the chosen columns in ONE scan (array of
  structs → one explode), values cast to string — the only corpus-sized
  pass;
- every column becomes a k-minimum-values sketch (k int64s regardless
  of table size — the artifact you'd persist per source at 100 TB);
- the pair scoring touches sketch rows only (``kmv_jaccard_pairs``):
  |tables_a| × |tables_b| pairs of ≤k-element arrays, driver-trivial,
  and the estimates are deterministic (portable two-stage hashes) so
  the DuckDB oracle mirrors them register-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgforge.datapipe.sketch import kmv_jaccard_pairs, kmv_sketch


def melt_columns(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
    """(col, val): one row per non-null value occurrence, column labeled
    ``table.column`` — one scan, one explode."""
    structs = [
        F.struct(
            F.lit(f"{table}.{c}").alias("col"),
            F.col(c).cast("string").alias("val"),
        )
        for c in cols
    ]
    return (
        df.select(F.explode(F.array(*structs)).alias("m"))
        .select(F.col("m.col").alias("col"), F.col("m.val").alias("val"))
        .filter(F.col("val").isNotNull())
    )


def column_sketches(
    melted: DataFrame, k: int = 64
) -> DataFrame:
    """Per-column KMV sketch over the distinct value strings."""
    return kmv_sketch(melted, ["col"], "val", k=k)


def match_columns(
    df_a: DataFrame,
    table_a: str,
    cols_a: list[str],
    df_b: DataFrame,
    table_b: str,
    cols_b: list[str],
    k: int = 64,
) -> DataFrame:
    """(col_a, col_b, jaccard_est) for every cross-table column pair —
    deterministic KMV estimates, same-table pairs excluded."""
    melted = melt_columns(df_a, table_a, cols_a).unionByName(
        melt_columns(df_b, table_b, cols_b)
    )
    sk = column_sketches(melted, k=k)
    pairs = kmv_jaccard_pairs(sk, "col", k=k)
    pa = F.substring_index(F.col("g_a"), ".", 1)
    pb = F.substring_index(F.col("g_b"), ".", 1)
    cross = pairs.filter(pa != pb)
    # orient every pair as (table_a column, table_b column)
    return cross.select(
        F.when(pa == table_a, F.col("g_a")).otherwise(F.col("g_b"))
        .alias("col_a"),
        F.when(pa == table_a, F.col("g_b")).otherwise(F.col("g_a"))
        .alias("col_b"),
        "jaccard_est",
    )


def best_column_match(matches: DataFrame) -> DataFrame:
    """Winner per col_a: highest estimated Jaccard, ties to the
    lexicographically smallest col_b."""
    w = Window.partitionBy("col_a").orderBy(
        F.desc("jaccard_est"), F.asc("col_b")
    )
    return (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
