"""Whole-graph summary statistics (degree assortativity, degree profile).

Degree assortativity (Newman 2002, "Assortative mixing in networks") is
the Pearson correlation of the degrees at the two ends of an edge: social
graphs run positive (hubs befriend hubs), infrastructure and similarity
graphs usually negative.  It is THE one-number skew diagnostic for a graph
pipeline — a strongly disassortative graph is exactly the shape where
hub-salting and degree-oriented wedge joins pay off.

Everything is computed from integer sums over the doubled edge list
(each undirected edge contributes both orientations, the standard
convention), so the aggregation is map-side combinable, partition-order
independent, and exact until the single final division:

    r = (S1*Se - S2^2) / (S1*S3 - S2^2)

with S1 = 2m, S2 = Σ deg, S3 = Σ deg², Se = Σ deg_u·deg_v over oriented
edge ends.  Sums stay in int64 — fine up to ~10^9 edges × 10^5 max degree;
beyond that switch the three aggregates to decimal(38,0) (one-line cast),
not to floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.triangles import _canonical


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One row: (n_nodes, n_edges, mean_degree, assortativity).

    ``assortativity`` is NULL for degree-regular graphs (zero variance in
    end degrees — the correlation is undefined, not 0)."""
    und = _canonical(edges, src, dst).persist()
    try:
        deg = (
            und.select(F.col("a").alias("n"))
            .unionByName(und.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
            .persist()
        )
        dirr = und.unionByName(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        dx = deg.select(F.col("n").alias("a"), F.col("d").alias("dx"))
        dy = deg.select(F.col("n").alias("b"), F.col("d").alias("dy"))
        sums = (
            dirr.join(dx, "a")
            .join(dy, "b")
            .agg(
                F.count(F.lit(1)).alias("s1"),
                F.sum("dx").alias("s2"),
                F.sum(F.col("dx") * F.col("dx")).alias("s3"),
                F.sum(F.col("dx") * F.col("dy")).alias("se"),
            )
        )
        nodes = deg.agg(
            F.count(F.lit(1)).alias("n_nodes"), F.sum("d").alias("sumd")
        )
        out = sums.crossJoin(F.broadcast(nodes)).select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            (F.col("s1") / 2).cast("bigint").alias("n_edges"),
            (F.col("sumd").cast("double") / F.col("n_nodes")).alias(
                "mean_degree"
            ),
            F.when(
                F.col("s1") * F.col("s3") - F.col("s2") * F.col("s2") != 0,
                (
                    F.col("s1") * F.col("se") - F.col("s2") * F.col("s2")
                ).cast("double")
                / (
                    F.col("s1") * F.col("s3") - F.col("s2") * F.col("s2")
                ).cast("double"),
            ).alias("assortativity"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        und.unpersist()
        try:
            deg.unpersist()
        except NameError:
            pass


def rich_club(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ks: list[int] | None = None,
) -> DataFrame:
    """Rich-club coefficient φ(k) per degree threshold: among the nodes of
    degree > k, the fraction of possible edges actually present —

        φ(k) = 2·E_k / (n_k · (n_k − 1))

    (Colizza et al. 2006).  A rising φ(k) means the hubs form their own
    dense core — operationally, the subgraph you must NEVER self-join
    without salting, so this is the planning diagnostic that says whether
    hub-core blowup exists at all.

    Input is a simple undirected edge list (one row per edge, either
    orientation).  Output: one row per threshold ``(k, n_nodes, n_edges,
    phi)`` — φ NULL when fewer than 2 nodes qualify.

    Scale: one degree aggregation, one edge×degree join (degree table
    broadcast by AQE when small), then ONE conditional aggregate over the
    edge list for ALL thresholds — the threshold sweep costs a constant
    factor, not a pass per k."""
    if ks is None:
        ks = [1, 2, 4, 8, 16]
    if not ks or any(k < 0 for k in ks):
        raise ValueError("ks must be non-empty, non-negative")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    j = e.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a").join(
        deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b"
    )
    e_aggs = j.agg(
        *[
            F.count(
                F.when(F.least(F.col("da"), F.col("db")) > k, 1)
            ).cast("bigint").alias(f"_e{k}")
            for k in ks
        ]
    )
    n_aggs = deg.agg(
        *[
            F.count(F.when(F.col("d") > k, 1)).cast("bigint").alias(f"_n{k}")
            for k in ks
        ]
    )
    both = e_aggs.crossJoin(F.broadcast(n_aggs))
    rows = both.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.col(f"_n{k}").alias("n_nodes"),
                        F.col(f"_e{k}").alias("n_edges"),
                    )
                    for k in ks
                ]
            )
        ).alias("_r")
    ).select("_r.k", "_r.n_nodes", "_r.n_edges")
    return rows.select(
        "k",
        "n_nodes",
        "n_edges",
        F.when(
            F.col("n_nodes") >= 2,
            F.round(
                (2 * F.col("n_edges")).cast("double")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
                6,
            ),
        ).alias("phi"),
    )
