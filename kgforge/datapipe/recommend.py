"""Item-item co-occurrence recommendation over transaction baskets.

The classic "customers who bought X also bought Y" co-purchase model
(Sarwar et al. 2001, item-based collaborative filtering; the count-based
cosine variant), computed exactly with integer arithmetic:

    co(a, b)   = # baskets containing both a and b
    n(a)       = # baskets containing a
    cosine²(a,b) = co² / (n(a)·n(b))       — kept as exact integer ppm
                                              (squaring avoids sqrt floats)

Scale shape: the pair generation is a self-join on the basket key, so the
shuffle is keyed by basket and the fan-out is bounded by items-per-basket
(TPC-H lineitem: ≤7 per order; real carts: tens) — never an item×item
product.  Degree counts broadcast when the item vocabulary is small; the
top-k is a bounded per-item window.  At 100 TB the whole model is three
combinable aggregations plus one bounded self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def copurchase_counts(
    baskets: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """(item_a, item_b, co_n) for every unordered pair co-occurring in at
    least one basket (item_a < item_b).  Distinct items per basket first —
    quantity does not multiply co-occurrence."""
    b = baskets.select(
        F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
    ).distinct()
    a = b.select(F.col("_bk"), F.col("_it").alias("item_a"))
    c = b.select(F.col("_bk"), F.col("_it").alias("item_b"))
    return (
        a.join(c, "_bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co_n"))
    )


def copurchase_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_co: int = 2,
) -> DataFrame:
    """Top-k recommendations per item: (item, rec, co_n, cos2_ppm, rank).

    cos2_ppm = co²·10⁶ div (n_item · n_rec) — the squared co-occurrence
    cosine in exact integer ppm (engine-portable, no sqrt).  Ranking is
    (cos2_ppm DESC, co_n DESC, rec ASC) — fully deterministic.
    ``min_co`` prunes noise pairs before the window."""
    if k < 1:
        raise ValueError("k must be >= 1")
    co = copurchase_counts(baskets, basket_col, item_col).filter(
        F.col("co_n") >= min_co
    )
    deg = (
        baskets.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .distinct()
        .groupBy("_it")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # both directions of each unordered pair, then score
    sym = co.select(
        F.col("item_a").alias("item"), F.col("item_b").alias("rec"), "co_n"
    ).unionByName(
        co.select(
            F.col("item_b").alias("item"), F.col("item_a").alias("rec"), "co_n"
        )
    )
    scored = (
        sym.join(deg.withColumnRenamed("_it", "item").withColumnRenamed("n", "n_item"), "item")
        .join(deg.withColumnRenamed("_it", "rec").withColumnRenamed("n", "n_rec"), "rec")
        .withColumn(
            # decimal(38,0) arithmetic: co_n²·10⁶ overflows int64 once a
            # pair co-occurs in > ~3.03M baskets (the same hazard
            # gini_splits hit for real at ~3M rows); the quotient is
            # ≤ 10⁶ so the bigint result cast is always safe
            "cos2_ppm",
            F.expr(
                "(CAST(co_n AS decimal(38,0)) * co_n * 1000000)"
                " div (CAST(n_item AS decimal(38,0)) * n_rec)"
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cos2_ppm"), F.desc("co_n"), F.asc("rec")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "item", "rec", "co_n", "cos2_ppm",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
