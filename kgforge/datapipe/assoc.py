"""Pairwise association mining (support / confidence / lift).

The market-basket staple (Agrawal & Srikant 1994) over any
(basket, item) relation — here typically (user, event_type) or
(doc, entity): which items co-occur more than their popularity predicts.
``lift > 1`` is the signal feature-cross and recommendation candidates
are built from; it is also the quickest leakage probe ("does event A
near-determine event B?") before training on behavioral data.

Scale shape: baskets are deduplicated to distinct (basket, item) pairs,
candidate item pairs are generated ONLY through shared baskets (one
self-join on the basket id — the co-mention-graph pattern, never an item
cross product), and the three count tables are map-side-combinable
groupBys.  Hub baskets (a user who does everything) contribute
quadratically in their basket size — cap them upstream with
``max_basket`` if the item universe is large.  All ratios are single
divisions of exact int64 counts, computed identically in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """(a, b, n_a, n_b, n_ab, support, conf_ab, conf_ba, lift) for every
    unordered item pair co-occurring in >= ``min_pair_count`` baskets.

    ``support`` = n_ab/N over N total baskets; ``conf_ab`` = P(b|a);
    ``lift`` = n_ab·N/(n_a·n_b) (>1 ⇔ positive association).  Baskets
    with more than ``max_basket`` distinct items are dropped entirely
    when the cap is set (the hub-basket stop-word bound)."""
    bi = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket is not None:
        sizes = bi.groupBy("bk").agg(F.count(F.lit(1)).alias("_sz"))
        bi = bi.join(
            sizes.filter(F.col("_sz") <= max_basket).select("bk"), "bk"
        )
    bi = bi.persist()
    try:
        n_total = bi.select("bk").distinct().count()
        items = bi.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
        l = bi.select("bk", F.col("item").alias("a"))
        r = bi.select("bk", F.col("item").alias("b"))
        pairs = (
            l.join(r, "bk")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_ab"))
        )
        if min_pair_count > 1:
            pairs = pairs.filter(F.col("n_ab") >= min_pair_count)
        na = items.select(F.col("item").alias("a"), F.col("n").alias("n_a"))
        nb = items.select(F.col("item").alias("b"), F.col("n").alias("n_b"))
        out = (
            pairs.join(F.broadcast(na), "a")
            .join(F.broadcast(nb), "b")
            .select(
                "a", "b", "n_a", "n_b", "n_ab",
                (F.col("n_ab") / F.lit(n_total)).alias("support"),
                (F.col("n_ab") / F.col("n_a")).alias("conf_ab"),
                (F.col("n_ab") / F.col("n_b")).alias("conf_ba"),
                (
                    (F.col("n_ab") * F.lit(n_total))
                    / (F.col("n_a") * F.col("n_b"))
                ).alias("lift"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        bi.unpersist()


def frequent_triples(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket: int = 20,
) -> DataFrame:
    """Frequent 3-itemsets: (a, b, c, n_abc) for every item triple
    co-occurring in ≥ ``min_count`` baskets (a < b < c) — the next
    Apriori level above :func:`association_rules`.

    Scale shape: the hub-basket cap (baskets over ``max_basket`` distinct
    items are dropped — same stop-word bound as the pair level) bounds the
    per-basket fan-out at C(max_basket, 3); items below ``min_count``
    global support cannot appear in a frequent triple (Apriori
    monotonicity) and are pruned BEFORE the joins, so the three-way
    basket self-join runs on the frequent-item projection only, keyed by
    basket."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    bi = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
    ).distinct()
    sizes = bi.groupBy("bk").agg(F.count(F.lit(1)).alias("_sz"))
    bi = bi.join(sizes.filter(F.col("_sz") <= max_basket).select("bk"), "bk")
    freq = (
        bi.groupBy("item")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("item")
    )
    bi = bi.join(freq, "item", "left_semi").persist()
    try:
        a = bi.select("bk", F.col("item").alias("a"))
        b = bi.select("bk", F.col("item").alias("b"))
        c = bi.select("bk", F.col("item").alias("c"))
        out = (
            a.join(b, "bk")
            .filter(F.col("a") < F.col("b"))
            .join(c, "bk")
            .filter(F.col("b") < F.col("c"))
            .groupBy("a", "b", "c")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_abc"))
            .filter(F.col("n_abc") >= min_count)
        )
        return out.localCheckpoint(eager=True)
    finally:
        bi.unpersist()
