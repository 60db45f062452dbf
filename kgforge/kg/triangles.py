"""Triangle counting via degree orientation (no GraphFrames jar).

The classic distributed algorithm (Suri & Vassilvitskii 2011): orient each
undirected edge from its lower-degree endpoint to its higher-degree one
(ties by node id), then a triangle is exactly one wedge u→v, u→w (v<w by
the same order) whose closing edge v→w is also oriented.  Orientation
bounds every node's out-degree by O(√m), so the wedge self-join — the only
quadratic step — is quadratic in √m per node instead of in the degree of a
hub: a celebrity node with millions of neighbors contributes wedges only
through its (few) higher-degree peers.  Three shuffles total: degree
groupBy, wedge self-join on u, closing-edge join on (v, w).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as distinct (a, b) with a < b, self-loops dropped."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def oriented_edges(edges: DataFrame, src: str = "src", dst: str = "dst",
                   caches: list | None = None) -> DataFrame:
    """(u, v) with u before v in (degree, id) order — the √m-out-degree DAG.

    ``und`` and ``deg`` are each referenced more than once downstream, so
    they are persisted (standard practice for iterative/graph plans — the
    alternative re-evaluates the caller's full edge lineage per reference).
    Pass ``caches`` to receive the handles for unpersisting."""
    und = _canonical(edges, src, dst).persist()
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    if caches is not None:
        caches.extend([und, deg])
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(n_triangles,) — one row with the global triangle count."""
    caches: list = []
    o = oriented_edges(edges, src, dst, caches=caches).persist()
    e1 = o.select(F.col("u"), F.col("v").alias("w1"))
    e2 = o.select(F.col("u"), F.col("v").alias("w2"))
    wedges = e1.join(e2, "u").filter(F.col("w1") < F.col("w2"))
    # wedge pairs are id-ordered; match the closing edge id-canonically
    closing = o.select(
        F.least("u", "v").alias("w1"), F.greatest("u", "v").alias("w2")
    )
    closed = wedges.join(closing, ["w1", "w2"], "left_semi")
    result = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    out = result.collect()[0]["n_triangles"]
    o.unpersist()
    for c in caches:
        c.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame([(out,)], "n_triangles bigint")


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, deg, n_tri, coeff): local clustering coefficient per node —
    2·triangles(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2.

    Same √m-bounded degree-oriented wedge join as :func:`triangle_count`;
    each closed wedge credits its THREE corners (one explode), so the
    per-node counts come out of a map-side-combinable groupBy — a hub's
    triangle count is aggregated, never enumerated through the hub's own
    out-degree (orientation keeps that O(√m))."""
    caches: list = []
    o = oriented_edges(edges, src, dst, caches=caches).persist()
    try:
        e1 = o.select(F.col("u"), F.col("v").alias("w1"))
        e2 = o.select(F.col("u"), F.col("v").alias("w2"))
        wedges = e1.join(e2, "u").filter(F.col("w1") < F.col("w2"))
        closing = o.select(
            F.least("u", "v").alias("w1"), F.greatest("u", "v").alias("w2")
        )
        closed = wedges.join(closing, ["w1", "w2"], "left_semi")
        corners = closed.select(
            F.explode(F.array("u", "w1", "w2")).alias("node")
        )
        tri = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
        # caches[1] is the (n, d) degree table oriented_edges built
        deg = caches[1].select(F.col("n").alias("node"), F.col("d").alias("deg"))
        out = (
            deg.join(tri, "node", "left")
            .select(
                "node",
                "deg",
                F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri"),
                F.when(
                    F.col("deg") >= 2,
                    F.lit(2.0) * F.coalesce(F.col("n_tri"), F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                ).otherwise(F.lit(0.0)).alias("coeff"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        o.unpersist()
        for c in caches:
            c.unpersist()
