"""k-core: the maximal subgraph where every node has degree ≥ k.

The standard iterative peel (Matula & Beck 1983, distributed form à la
Montresor et al.): repeatedly delete every node whose current degree is
below k until none remains.  The fixpoint is unique (the k-core is the
maximal such subgraph regardless of deletion order), so the result is a
pure function of the undirected edge set — deterministic across engines
and partitionings, and an R-round unrolled SQL peel equals the fixpoint
whenever the graph converges within R rounds.

Execution shape per round: one degree groupBy (map-side combinable — hubs
never pin a reducer) + two semi-joins of the edge table against the
surviving-node set, lineage truncated with an eager ``localCheckpoint``.
The only driver traffic is the one-scalar convergence check per round.
Rounds are bounded by the peel depth (≤ longest chain of cascading
deletions; small for real co-occurrence graphs, O(n) only on pathological
paths).  A driver fast path below ``driver_threshold`` edges peels in a
python dict — one job instead of O(rounds) shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.triangles import _canonical


def _driver_kcore(pairs, k: int) -> list[tuple]:
    """Plain-python peel; returns sorted (node, core_degree)."""
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    while True:
        bad = [v for v, s in nbrs.items() if len(s) < k]
        if not bad:
            break
        for v in bad:
            for u in nbrs[v]:
                nbrs[u].discard(v)
            del nbrs[v]
    return sorted((v, len(s)) for v, s in nbrs.items())


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int | None = None,
    driver_threshold: int = 0,
) -> DataFrame:
    """edges (src, dst) → (node, deg): the nodes of the k-core with their
    within-core degree.  Empty when no k-core exists.

    ``max_rounds`` caps the peel (None = run to the fixpoint); a capped run
    returns the degree table of the R-times-peeled graph (which may still
    contain sub-k nodes) — exactly what an R-round unrolled SQL mirror
    computes, so the two agree whether or not the peel has converged."""
    if driver_threshold > 0:
        fetched = edges.select(src, dst).limit(driver_threshold + 1).collect()
        if len(fetched) <= driver_threshold:
            pairs = {(min(r[0], r[1]), max(r[0], r[1]))
                     for r in fetched if r[0] != r[1]}
            spark = edges.sparkSession
            dt = dict(edges.dtypes)[src]
            return spark.createDataFrame(
                _driver_kcore(sorted(pairs), k) or [],
                schema=f"node {dt}, deg bigint",
            )

    cur = _canonical(edges, src, dst).localCheckpoint(eager=True)
    rounds = 0
    while True:
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionByName(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=True)
        )
        n_bad = deg.filter(F.col("deg") < k).count()
        if n_bad == 0:
            return deg
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            return deg
        keep = deg.filter(F.col("deg") >= k).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
