"""PageRank as an iterated DataFrame loop (no GraphFrames jar).

Standard damped PageRank (Page et al. 1999) with a fixed iteration count —
the shape a KG user runs over the materialized entity graph to rank
canonical entities by centrality.  Same execution strategy as
``kgforge.kg.components``: each iteration is one shuffle (groupBy on the
destination node), lineage truncated with an eager ``localCheckpoint`` so
plans stay flat and the rank table is computed exactly once per round
(``ranks`` feeds both the contribution join and the dangling-mass
aggregate — without the checkpoint the double reference doubles the
lineage every iteration).  Dangling nodes (no out-edges) redistribute
their mass uniformly, so total rank stays 1.0 every iteration.

Scale notes (100 TB): the edge table is the big side; per iteration it is
joined once against the one-row-per-node rank table and aggregated by
destination.  High-in-degree entities land in a groupBy (map-side
combinable partial aggregation), not a join key, so hot nodes do not pin a
reducer.  The dangling term is a broadcast one-row cross join, never a
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_pagerank(rows, iterations: int, damping: float) -> list[tuple]:
    """numpy power iteration — same update formula as the distributed loop
    (results agree up to float-summation order)."""
    import numpy as np

    nodes = sorted({u for u, _ in rows} | {v for _, v in rows})
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    src = np.fromiter((idx[u] for u, _ in rows), dtype=np.int64, count=len(rows))
    dst = np.fromiter((idx[v] for _, v in rows), dtype=np.int64, count=len(rows))
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    dangling = outdeg == 0
    base = (1.0 - damping) / n
    for _ in range(iterations):
        inflow = np.bincount(dst, weights=r[src] / outdeg[src], minlength=n)
        dm = r[dangling].sum()
        r = base + damping * (inflow + dm / n)
    return [(nodes[i], float(r[i])) for i in range(n)]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    driver_threshold: int = 0,
    n_edges: int | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """edges (src, dst) → (node, rank) after ``iterations`` damped rounds.

    Nodes are every id appearing as src or dst.  Initial rank 1/N.  Each
    round: rank' = (1-d)/N + d * (Σ_in rank/outdeg + dangling_mass/N).
    Deterministic up to float-summation order (callers comparing across
    engines should round).

    Like :func:`kgforge.kg.components.connected_components`: when the edge
    count (``n_edges`` if known, else a ``count()``) is at or below
    ``driver_threshold``, the graph is collected and solved with a numpy
    power iteration — one job instead of O(iterations) shuffle rounds,
    which is the right trade below ~10^5 edges.  Above it, the distributed
    loop runs; both paths compute the same formula.

    ``init_ranks`` (node, rank) warm-starts the loop instead of the
    uniform 1/N vector — the checkpoint-resume hook for the iterative
    layer: ``pagerank(e, iterations=5)`` equals
    ``pagerank(e, iterations=2, init_ranks=pagerank(e, iterations=3))``
    round-for-round (asserted in tests; only float summation order can
    differ, within round-6).  The node universe stays edge-derived; an
    init vector over a different node set contributes rank 0 for missing
    nodes (left join below).
    """
    if init_ranks is None and driver_threshold > 0 and (n_edges is None or n_edges <= driver_threshold):
        # single action: over-fetch by one — a full result means the graph
        # fits on the driver, an overflow falls through to the distributed
        # loop.  (A separate count() would evaluate the caller's plan twice.)
        fetched = edges.select(src, dst).limit(driver_threshold + 1).collect()
        if len(fetched) <= driver_threshold:
            rows = [(r[0], r[1]) for r in fetched]
            spark = edges.sparkSession
            dt = dict(edges.dtypes)[src]
            if not rows:
                return spark.createDataFrame([], f"node {dt}, rank double")
            return spark.createDataFrame(
                _driver_pagerank(rows, iterations, damping),
                schema=f"node {dt}, rank double",
            )
    # cache the edge list first: the caller's plan may be arbitrarily deep
    # (and may reference its own subtrees several times) — everything below
    # reads edges repeatedly
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))

    # both reused every iteration (outdeg by the dangling anti-join) — must
    # be cached or each round recomputes the full upstream edge lineage
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    # edges annotated with the sender's out-degree
    e_deg = e.join(outdeg, "src").persist()

    if init_ranks is None:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    else:
        ranks = (
            nodes.join(
                init_ranks.select("node", F.col("rank").alias("_r0")),
                "node", "left",
            )
            .select("node", F.coalesce("_r0", F.lit(0.0)).alias("rank"))
            .localCheckpoint(eager=True)
        )
    base = (1.0 - damping) / n
    for i in range(iterations):
        contrib = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # mass parked on dangling nodes (no out-edges) spreads uniformly;
        # one-row aggregate folded into the plan via broadcast cross join
        dang = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0))
                       + F.col("_dm") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        # eager: computes this round once and truncates lineage (ranks is
        # referenced twice next round); final round too, so the caches can
        # be released before returning
        ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    outdeg.unpersist()
    e_deg.unpersist()
    e.unpersist()
    return ranks


def _driver_ppr(rows, srcs, iterations: int, damping: float) -> list[tuple]:
    """numpy mirror of the distributed personalized loop."""
    import numpy as np

    nodes = sorted({u for u, _ in rows} | {v for _, v in rows})
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    src = np.fromiter((idx[u] for u, _ in rows), dtype=np.int64, count=len(rows))
    dst = np.fromiter((idx[v] for _, v in rows), dtype=np.int64, count=len(rows))
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    present = [s for s in srcs if s in idx]
    p = np.zeros(n)
    for s in present:
        p[idx[s]] = 1.0 / len(present)
    r = p.copy()
    dangling = outdeg == 0
    for _ in range(iterations):
        inflow = np.bincount(dst, weights=r[src] / outdeg[src], minlength=n)
        dm = r[dangling].sum()
        r = (1.0 - damping) * p + damping * (inflow + dm * p)
    return [(nodes[i], float(r[i])) for i in range(n)]


def personalized_pagerank(
    edges: DataFrame,
    sources,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    driver_threshold: int = 0,
    n_edges: int | None = None,
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank: random walk with restarts
    into ``sources`` — rank' = (1-d)·p + d·(Σ_in rank/outdeg + dangling·p),
    where p is uniform over the source set (Haveliwala 2002, public).  The
    ranking a KG user runs to score entities by proximity to a seed set
    (e.g. "entities related to these documents' topics").

    ``sources`` is a list of node ids or a single-column DataFrame.  Sources
    absent from the graph are ignored (p renormalizes over the present
    ones); an empty intersection raises.  Same execution strategy and scale
    shape as :func:`pagerank` — the only structural difference is that the
    teleport and dangling terms concentrate on p instead of 1/N, which is a
    broadcast flag join, not a new shuffle.
    """
    spark = edges.sparkSession
    if isinstance(sources, DataFrame):
        s_list = [r[0] for r in sources.distinct().collect()]
    else:
        s_list = list(dict.fromkeys(sources))
    if not s_list:
        raise ValueError("personalized_pagerank: empty source set")

    if driver_threshold > 0 and (n_edges is None or n_edges <= driver_threshold):
        fetched = edges.select(src, dst).limit(driver_threshold + 1).collect()
        if len(fetched) <= driver_threshold:
            rows = [(r[0], r[1]) for r in fetched]
            dt = dict(edges.dtypes)[src]
            if not rows:
                return spark.createDataFrame([], f"node {dt}, rank double")
            if not any(s in {u for u, _ in rows} | {v for _, v in rows} for s in s_list):
                raise ValueError("personalized_pagerank: no source is in the graph")
            return spark.createDataFrame(
                _driver_ppr(rows, s_list, iterations, damping),
                schema=f"node {dt}, rank double",
            )

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    s_df = F.broadcast(
        spark.createDataFrame([(s,) for s in s_list], ["node"]).distinct()
    )
    # p is a column on the node table: 1/|S∩V| on present sources, else 0
    flagged = nodes.join(s_df.withColumn("_s", F.lit(True)), "node", "left")
    n_s = flagged.filter(F.col("_s")).count()
    if n_s == 0:
        e.unpersist()
        nodes.unpersist()
        raise ValueError("personalized_pagerank: no source is in the graph")
    nodes_p = flagged.select(
        "node",
        F.when(F.col("_s"), F.lit(1.0 / n_s)).otherwise(F.lit(0.0)).alias("p"),
    ).persist()

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    e_deg = e.join(outdeg, "src").persist()

    ranks = nodes_p.select("node", F.col("p").alias("rank"))
    for _ in range(iterations):
        contrib = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        dang = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes_p.join(contrib, nodes_p["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("p")
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0))
                       + F.col("_dm") * F.col("p"))
                ).alias("rank"),
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    nodes_p.unpersist()
    outdeg.unpersist()
    e_deg.unpersist()
    e.unpersist()
    return ranks


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 6,
    alpha_den: int = 20,
    directed: bool = False,
) -> DataFrame:
    """Truncated Katz centrality in exact integer fixed-point.

    Katz (1953) scores a node by its attenuated walk count:
    ``x = Σ_t α^t (Aᵀ)^t 1``.  This operator runs the truncated recurrence

        x₀ = S;   x_{t+1}(v) = S + (Σ_{u→v} x_t(u)) div alpha_den

    with S = 10⁶ micro-units and α = 1/alpha_den, entirely in BIGINT
    (``div`` is Java-truncating integer division) — every engine computes
    the identical number, no float rounding policy needed.  Truncation at
    ``iterations`` hops means convergence (α < 1/λ_max) is NOT required;
    the score is "walks of length ≤ iterations, geometrically attenuated".

    Output: ``(node, katz_mu)`` — micro-units; divide by 1e6 for the usual
    scale.  Undirected by default (each edge contributes both directions).

    Scale: per round one join of the adjacency against the current score
    vector + one combinable groupBy, localCheckpoint between rounds to cap
    the plan tower.  Integer bound: scores grow ≤ (max_deg/alpha_den) per
    hop — int64-safe for max_deg/alpha_den ≤ ~130 at 6 hops."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    if not directed:
        e = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = e.distinct().persist()
    try:
        scale = 10**6
        x = (
            adj.select(F.col("u").alias("node"))
            .unionByName(adj.select(F.col("v").alias("node")))
            .distinct()
            .withColumn("x", F.lit(scale).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        for _ in range(iterations):
            inc = (
                adj.join(x.withColumnRenamed("node", "u"), "u")
                .groupBy(F.col("v").alias("node"))
                .agg(F.sum("x").cast("bigint").alias("_s"))
            )
            x = (
                x.select("node")
                .join(inc, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(scale)
                        + F.expr(f"coalesce(_s, 0L) div {alpha_den}")
                    ).cast("bigint").alias("x"),
                )
                .localCheckpoint(eager=True)
            )
        return x.withColumnRenamed("x", "katz_mu")
    finally:
        adj.unpersist()
