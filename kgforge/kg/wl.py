"""Weisfeiler–Leman structural node colors (hash-multiset 1-WL).

The structural-role labeler: after R refinement rounds, two nodes share a
color only if their R-hop neighborhood structures are indistinguishable by
the 1-WL test — the standard preprocessing for graph-isomorphism checks,
structural-role features, and graph-kernel similarity.

The classic refinement hashes the SORTED multiset of neighbor colors; a
sorted list per node is a scale hazard (a 10^6-degree hub materializes a
10^6-element list in one aggregation buffer).  This implementation uses
the hash-multiset variant: the multiset is folded through a commutative
per-color mix and SUMMED —

    g(c)       = (c² + 31·c + 7) mod P          (P = 2^31 − 1)
    color'(v)  = (color(v)·1000003 + Σ_{u∈N(v)} g(color(u)) + 7777) mod P

so the neighbor aggregation is a plain map-side-combinable groupBy sum
(hub-safe), every operation is exact 64-bit integer arithmetic (identical
in any engine — no floats, no collation), and the refinement remains
injective up to the usual hash-collision caveat (sum collisions of g are
possible in principle; P-sized mixing makes them vanishingly rare and a
collision only MERGES classes, never splits one).  Initial color =
degree, as in standard 1-WL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.triangles import _canonical

_P = 2147483647


def _py_wl(pairs, rounds: int) -> dict:
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    color = {v: len(s) for v, s in nbrs.items()}
    for _ in range(rounds):
        nxt = {}
        for v in nbrs:
            sg = sum((color[u] * color[u] + 31 * color[u] + 7) % _P
                     for u in nbrs[v])
            nxt[v] = (color[v] * 1000003 + sg + 7777) % _P
        color = nxt
    return color


def wl_colors(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """edges (src, dst) → (node, color): hash-multiset 1-WL colors after
    ``rounds`` refinements (initial color = degree).  Pure integer
    arithmetic — deterministic across engines and partitionings."""
    und = _canonical(edges, src, dst).persist()
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionByName(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .persist()
    )
    try:
        colors = (
            adj.groupBy("node")
            .agg(F.count(F.lit(1)).alias("color"))
            .localCheckpoint(eager=True)
        )
        for _ in range(rounds):
            c = F.col("color")
            inbox = (
                adj.join(colors.withColumnRenamed("node", "nbr"), "nbr")
                .select("node", ((c * c + F.lit(31) * c + F.lit(7)) % F.lit(_P)).alias("g"))
                .groupBy("node")
                .agg(F.sum("g").alias("sg"))
            )
            colors = (
                colors.join(inbox, "node")
                .select(
                    "node",
                    (
                        (F.col("color") * F.lit(1000003) + F.col("sg") + F.lit(7777))
                        % F.lit(_P)
                    ).alias("color"),
                )
                .localCheckpoint(eager=True)
            )
        return colors
    finally:
        und.unpersist()
        adj.unpersist()


def feature_propagation(
    edges: DataFrame,
    features: DataFrame,
    node_col: str = "node",
    feature_col: str = "f",
    hops: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """GraphSAGE-mean-style feature smoothing without learnables: ``hops``
    rounds of ``f'(v) = (f(v) + mean over neighbors of f(u)) / 2`` over the
    undirected graph — the standard cheap node-feature prep (label/feature
    propagation for semi-supervised bootstrapping, cold-start smoothing).

    Arithmetic is fixed-point MICRO-UNITS (×10⁶) end to end: the neighbor
    mean is an integer ``sum div n`` and the blend ``(f + m) div 2`` — all
    64-bit integer ops, so the result is exactly order-independent (a
    float mean rounded per hop can flip its last digit with partition
    order when a value lands on the rounding boundary — observed, which is
    why this operator refuses floats internally).  Input features must be
    NON-NEGATIVE (integer division spec); nodes missing from ``features``
    start at 0, isolated feature rows keep their value.  Each round is one
    equi-join + one map-side-combinable sum/count."""
    und = _canonical(edges, src, dst).persist()
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionByName(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .persist()
    )
    try:
        nodes = adj.select("node").distinct().unionByName(
            features.select(F.col(node_col).alias("node"))
        ).distinct()
        cur = (
            nodes.join(
                features.select(
                    F.col(node_col).alias("node"),
                    F.round(F.col(feature_col).cast("double") * 1e6)
                    .cast("long")
                    .alias("fm"),
                ),
                "node",
                "left",
            )
            .select("node", F.coalesce("fm", F.lit(0)).alias("fm"))
            .localCheckpoint(eager=True)
        )
        for _ in range(hops):
            nbr_mean = (
                adj.join(cur.withColumnRenamed("node", "nbr"), "nbr")
                .groupBy("node")
                .agg(
                    F.sum("fm").alias("s"), F.count(F.lit(1)).alias("n")
                )
                .select("node", F.expr("s div n").alias("m"))
            )
            cur = (
                cur.join(nbr_mean, "node", "left")
                .select(
                    "node",
                    F.when(
                        F.col("m").isNotNull(),
                        F.expr("(fm + m) div 2"),
                    ).otherwise(F.col("fm")).alias("fm"),
                )
                .localCheckpoint(eager=True)
            )
        return cur.select("node", (F.col("fm") / F.lit(1e6)).alias("f"))
    finally:
        und.unpersist()
        adj.unpersist()
