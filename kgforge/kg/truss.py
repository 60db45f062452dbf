"""k-truss decomposition by iterative support pruning.

The k-truss of an undirected graph is the maximal subgraph in which every
edge participates in at least k-2 triangles *within the subgraph* (Cohen
2008) — a cohesion notion stronger than k-core and the standard "keep only
the provably-dense relationships" filter before community mining on noisy
co-occurrence graphs.

Each round recomputes per-edge triangle support on the surviving subgraph
with the degree-oriented wedge join from :mod:`kgforge.kg.triangles`
(every node's wedge fan-out is O(√m), so hubs never enumerate their own
neighborhoods), drops edges below k-2, and repeats until a fixpoint — the
peeling converges because the edge set only shrinks.  Per round: three
shuffles (degree groupBy, wedge self-join, closing-edge semi-join) plus a
support groupBy; `localCheckpoint` truncates the per-round lineage exactly
like the other iterated graph operators in this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.triangles import _canonical, oriented_edges


def _edge_support(cur: DataFrame) -> DataFrame:
    """(a, b, sup): triangles per canonical edge of ``cur`` [(a, b), a<b]."""
    caches: list = []
    o = oriented_edges(cur, "a", "b", caches=caches).persist()
    try:
        e1 = o.select(F.col("u"), F.col("v").alias("w1"))
        e2 = o.select(F.col("u"), F.col("v").alias("w2"))
        wedges = e1.join(e2, "u").filter(F.col("w1") < F.col("w2"))
        closing = o.select(
            F.least("u", "v").alias("w1"), F.greatest("u", "v").alias("w2")
        )
        closed = wedges.join(closing, ["w1", "w2"], "left_semi")
        sides = closed.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("u", "w1").alias("a"),
                        F.greatest("u", "w1").alias("b"),
                    ),
                    F.struct(
                        F.least("u", "w2").alias("a"),
                        F.greatest("u", "w2").alias("b"),
                    ),
                    F.struct(F.col("w1").alias("a"), F.col("w2").alias("b")),
                )
            ).alias("e")
        )
        sup = (
            sides.select("e.a", "e.b")
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        return sup.localCheckpoint(eager=True)
    finally:
        o.unpersist()
        for c in caches:
            c.unpersist()


def k_truss(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """(a, b, sup): edges of the k-truss with their final in-truss support.

    ``max_rounds`` bounds the peeling (each round strictly shrinks the edge
    set or the loop stops, so convergence needs at most |E| rounds and in
    practice a handful); the fixpoint support is recomputed once more on
    the final subgraph so the reported ``sup`` is self-consistent."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    cur = _canonical(edges, src, dst).localCheckpoint(eager=True)
    n = cur.count()
    for _ in range(max_rounds):
        if n == 0:
            break
        sup = _edge_support(cur)
        kept = (
            cur.join(sup, ["a", "b"])
            .filter(F.col("sup") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        m = kept.count()
        cur = kept
        if m == n:
            break
        n = m
    return cur.join(_edge_support(cur), ["a", "b"]).select("a", "b", "sup")
