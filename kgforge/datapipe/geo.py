"""Grid-cell spatial join: all pairs of points within a radius.

The standard distributed spatial join (the grid/bucket strategy every
geo engine uses before R-trees): snap each point to a square cell of
side ``radius``, replicate ONE side into its 3×3 cell neighborhood, and
equi-join on the cell id — every qualifying pair lands in exactly one
(home-cell, replicated-cell) bucket, so candidates are bounded by local
density, never the corpus pair count.  The exact predicate
``dx² + dy² ≤ r²`` then prunes the corner candidates.

Coordinates are PLANAR INTEGERS (micro-degrees after a local
equirectangular projection, metres in a UTM zone, pixel coordinates —
whatever the caller projects to upstream).  Keeping the operator planar
and integral makes every emitted value exact: cell ids are truncating
divisions, distances are integer squares, and the result is
bit-identical on any engine and partitioning — no haversine floats on
the decision boundary.

Scale shape: 9× replication of one side (constant factor), one
equi-join shuffle on the cell id, and per-cell fan-out bounded by the
cell's own population — the skew story is the data's density map, and a
hot cell can be salted like any hot join key.  Negative coordinates
work: cell ids use floor division via ``(x - pmod(x, r)) / r`` so cells
tile the whole plane uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(col, r: int):
    # floor division that matches DuckDB's // on negatives (Spark div
    # truncates toward zero, so build floor() from pmod explicitly)
    return ((col - F.pmod(col, F.lit(r))) / r).cast("bigint")


def planar_radius_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """``(a, b, dist2)`` for every pair of distinct points at squared
    Euclidean distance ``dist2 <= radius²``, with ``a < b`` (ids must be
    orderable and unique).  Coordinates must be integral.
    """
    if radius < 1:
        raise ValueError("radius must be >= 1")
    r = int(radius)
    p = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    home = p.select(
        "id", "x", "y", _cell(F.col("x"), r).alias("cx"), _cell(F.col("y"), r).alias("cy")
    )
    off = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    repl = (
        p.select("id", "x", "y", _cell(F.col("x"), r).alias("hx"),
                 _cell(F.col("y"), r).alias("hy"), off.alias("o"))
        .select(
            F.col("id").alias("id_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            (F.col("hx") + F.col("o.dx")).alias("cx"),
            (F.col("hy") + F.col("o.dy")).alias("cy"),
        )
    )
    d2 = (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb")) + (
        F.col("y") - F.col("yb")
    ) * (F.col("y") - F.col("yb"))
    return (
        home.join(repl, ["cx", "cy"])
        .filter(F.col("id") < F.col("id_b"))
        .select(
            F.col("id").alias("a"),
            F.col("id_b").alias("b"),
            d2.alias("dist2"),
        )
        .filter(F.col("dist2") <= r * r)
    )


def nearest_neighbor(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """Each point's nearest other point within ``radius``: ``(id, nn_id,
    dist2)`` — points with no neighbor in range are absent (bounded-range
    NN, the honest distributed contract: an unbounded NN needs the whole
    plane).  Ties break on the smaller neighbor id, so the result is
    deterministic."""
    pairs = planar_radius_join(points, id_col, x_col, y_col, radius)
    both = pairs.select(
        F.col("a").alias("id"), F.col("b").alias("nn"), "dist2"
    ).unionByName(
        pairs.select(F.col("b").alias("id"), F.col("a").alias("nn"), "dist2")
    )
    return both.groupBy("id").agg(
        F.min(F.struct("dist2", "nn")).alias("_m")
    ).select("id", F.col("_m.nn").alias("nn_id"), F.col("_m.dist2").alias("dist2"))
