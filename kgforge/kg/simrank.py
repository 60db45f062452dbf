"""SimRank structural similarity — "two nodes are similar when their
in-neighbors are similar" (Jeh & Widom 2002):

    s(a,a) = 1
    s(a,b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j)

computed by the standard power iteration, but in FIXED-POINT integers so
the result is bit-identical across engines and partitionings: scores are
scaled by 10^6, the decay C = c_num/c_den stays rational, and each update
is ``(c_num · Σ s) div (c_den · |I(a)| · |I(b)|)`` — integer truncation is
the only rounding, applied identically everywhere (the same trick as
feature propagation's micro-units).

The pair table is kept SPARSE: absent pair = 0, and truncated-to-zero
pairs are dropped each round, so the state never materializes n² rows for
graphs whose similarity neighborhoods are local.  Each round is two
equi-joins of the state against the edge list (propagate (i,j) mass to
every (x,y) with i→x, j→y) plus one groupBy — the SQL form of the
matrix identity S' = C·Wᵀ S W with column-normalized W.

Scale: state size is bounded by (Σ out-degree)² / n in the worst round —
for hub-heavy digraphs cap the blowup upstream (degree-cap or sample the
in-lists); the joins shuffle on node id, AQE handles the skewed hot
columns.  Iterations are O(diameter-ish) — 3 rounds give the classic
"co-cited by co-cited" horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def simrank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    c_num: int = 8,
    c_den: int = 10,
) -> DataFrame:
    """(a, b, simrank) for node pairs with nonzero truncated score,
    a < b (the relation is symmetric); ``simrank`` = fixed-point
    score / 10^6, rounded to 6 decimals by construction."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not (0 < c_num < c_den):
        raise ValueError("decay must satisfy 0 < c_num/c_den < 1")
    e = (
        edges.select(
            F.col(src).cast("bigint").alias("u"),
            F.col(dst).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    try:
        nodes = (
            e.select(F.col("u").alias("n"))
            .unionByName(e.select(F.col("v").alias("n")))
            .distinct()
        )
        indeg = e.groupBy(F.col("v").alias("n")).agg(
            F.count(F.lit(1)).cast("bigint").alias("ind")
        )
        diag = nodes.select(
            F.col("n").alias("a"),
            F.col("n").alias("b"),
            F.lit(SCALE).cast("bigint").alias("s"),
        )
        s = diag
        for _ in range(iterations):
            sums = (
                s.join(
                    e.select(F.col("u").alias("a"), F.col("v").alias("x")),
                    "a",
                )
                .join(
                    e.select(F.col("u").alias("b"), F.col("v").alias("y")),
                    "b",
                )
                .filter(F.col("x") != F.col("y"))
                .groupBy("x", "y")
                .agg(F.sum("s").cast("bigint").alias("_ssum"))
            )
            upd = (
                sums.join(indeg.select(F.col("n").alias("x"), F.col("ind").alias("_ia")), "x")
                .join(indeg.select(F.col("n").alias("y"), F.col("ind").alias("_ib")), "y")
                .select(
                    F.col("x").alias("a"),
                    F.col("y").alias("b"),
                    F.expr(
                        f"CAST(({c_num} * _ssum) div ({c_den} * _ia * _ib) AS BIGINT)"
                    ).alias("s"),
                )
                .filter(F.col("s") > 0)
            )
            s = upd.unionByName(diag).localCheckpoint(eager=True)
        out = s.filter(F.col("a") < F.col("b"))
        return out.select(
            "a", "b", (F.col("s") / F.lit(float(SCALE))).alias("simrank")
        )
    finally:
        e.unpersist()
