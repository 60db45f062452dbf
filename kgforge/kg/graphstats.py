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


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    label: str = "label",
) -> DataFrame:
    """Per-community Newman modularity decomposition of a partition.

    Input: an edge list and a (node, label) partition (e.g. the output of
    :func:`kgforge.kg.communities.label_propagation`).  Output: one row per
    community ``(label, n_nodes, m_intra, d_total, contribution)`` where
    ``contribution = m_c/m − (d_c/2m)²`` — Q is the sum of the column.
    Nodes that carry edges but no label (or vice versa) are ignored for
    m_intra but labeled nodes always appear with their degree mass, so a
    partition that forgets nodes shows up as missing rows, not silent Q
    drift.

    Everything per row is integer-exact (m, m_c, d_c are BIGINTs; the one
    float expression is per-community), so the output needs no
    cross-community float ordering at all — callers wanting total Q should
    sum ``contribution`` over the labels SORTED for a reproducible float
    (or accept last-ulp variance).

    Scale: canonicalize edges, two label-dictionary joins (AQE broadcasts
    when small, shuffle-hash otherwise), two combinable groupBys.  No
    self-joins, no windows."""
    und = _canonical(edges, src, dst).persist()
    lab = labels.select(
        F.col(node).alias("_n"), F.col(label).alias("_l")
    ).persist()
    try:
        m = und.count()
        la = lab.select(F.col("_n").alias("a"), F.col("_l").alias("la"))
        lb = lab.select(F.col("_n").alias("b"), F.col("_l").alias("lb"))
        tagged = und.join(la, "a").join(lb, "b")
        intra = (
            tagged.filter(F.col("la") == F.col("lb"))
            .groupBy(F.col("la").alias("label"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("m_intra"))
        )
        deg = (
            und.select(F.col("a").alias("_n"))
            .unionByName(und.select(F.col("b").alias("_n")))
            .groupBy("_n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )
        comm = (
            lab.join(deg, "_n", "left")
            .groupBy(F.col("_l").alias("label"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                F.sum(F.coalesce(F.col("d"), F.lit(0)))
                .cast("bigint")
                .alias("d_total"),
            )
        )
        out = comm.join(intra, "label", "left").select(
            "label",
            "n_nodes",
            F.coalesce(F.col("m_intra"), F.lit(0).cast("bigint")).alias(
                "m_intra"
            ),
            "d_total",
            F.round(
                F.when(
                    F.lit(m > 0),
                    F.coalesce(F.col("m_intra"), F.lit(0)).cast("double")
                    / F.lit(float(m or 1))
                    - (
                        F.col("d_total").cast("double")
                        / F.lit(2.0 * (m or 1))
                    )
                    * (F.col("d_total").cast("double") / F.lit(2.0 * (m or 1))),
                ),
                6,
            ).alias("contribution"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        und.unpersist()
        lab.unpersist()


def conductance(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    label: str = "label",
) -> DataFrame:
    """Per-community conductance φ(C) = cut(C) / min(vol(C), 2m − vol(C)) —
    the companion metric to :func:`modularity`: modularity rewards heavy
    internal mass, conductance penalizes a leaky boundary; a good cluster
    needs both.

    Output: one row per community ``(label, n_nodes, cut, volume,
    conductance)`` — cut and volume are exact BIGINTs, the ratio the one
    per-row float.  A community with zero volume (only isolated labeled
    nodes) reports NULL conductance; the whole-graph community (vol = 2m)
    likewise — its complement is empty so φ is undefined, not 0.

    Scale: same join shape as modularity — two label-dictionary joins,
    two combinable groupBys, no self-join."""
    und = _canonical(edges, src, dst).persist()
    lab = labels.select(
        F.col(node).alias("_n"), F.col(label).alias("_l")
    ).persist()
    try:
        m2 = 2 * und.count()
        la = lab.select(F.col("_n").alias("a"), F.col("_l").alias("la"))
        lb = lab.select(F.col("_n").alias("b"), F.col("_l").alias("lb"))
        tagged = und.join(la, "a").join(lb, "b").persist()
        try:
            cross = tagged.filter(F.col("la") != F.col("lb"))
            cut = (
                cross.select(F.col("la").alias("label"))
                .unionByName(cross.select(F.col("lb").alias("label")))
                .groupBy("label")
                .agg(F.count(F.lit(1)).cast("bigint").alias("cut"))
            )
            deg = (
                und.select(F.col("a").alias("_n"))
                .unionByName(und.select(F.col("b").alias("_n")))
                .groupBy("_n")
                .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
            )
            comm = (
                lab.join(deg, "_n", "left")
                .groupBy(F.col("_l").alias("label"))
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                    F.sum(F.coalesce(F.col("d"), F.lit(0)))
                    .cast("bigint")
                    .alias("volume"),
                )
            )
            denom = F.least(F.col("volume"), F.lit(m2) - F.col("volume"))
            out = comm.join(cut, "label", "left").select(
                "label",
                "n_nodes",
                F.coalesce(F.col("cut"), F.lit(0).cast("bigint")).alias("cut"),
                "volume",
                F.round(
                    F.when(
                        denom > 0,
                        F.coalesce(F.col("cut"), F.lit(0)).cast("double")
                        / denom,
                    ),
                    6,
                ).alias("conductance"),
            )
            return out.localCheckpoint(eager=True)
        finally:
            tagged.unpersist()
    finally:
        und.unpersist()
        lab.unpersist()


def partition_quality(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Audit of a k-way hash partitioning of a graph — the layout
    question every distributed graph job answers implicitly (edge-cut =
    network traffic per iteration, balance = straggler risk; the metrics
    minimized by partitioners like METIS and measured for hash baselines
    in the Pregel/PowerGraph literature).

    Nodes are placed by the repo's portable padded two-stage hash mod k
    (exactly the co-partitioning a cluster layout would use), so the
    audit itself is deterministic and engine-exact.  Output: one row
    (k, n_nodes, n_edges, cut_edges, cut_ppm, min_part, max_part,
    balance_ppm) with balance = max_part·k·10⁶ div n_nodes (10⁶ =
    perfectly balanced).

    Scale shape: the part assignment is a projection; cut counting is
    one combinable aggregate over edges; sizes are one aggregate over
    distinct nodes.  Nothing joins.
    """
    from kgforge.datapipe.sketch import _stage2_padded

    if k < 2:
        raise ValueError("k must be >= 2")
    part = lambda c: (_stage2_padded(c.cast("string")) % k)
    e = edges.select(
        part(F.col(src)).alias("ps"), part(F.col(dst)).alias("pd"))
    ecut = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum(F.when(F.col("ps") != F.col("pd"), 1).otherwise(0))
        .cast("bigint").alias("cut_edges"),
    )
    nodes = edges.select(F.col(src).alias("node")).unionByName(
        edges.select(F.col(dst).alias("node"))).distinct()
    sizes = (
        nodes.select(part(F.col("node")).alias("p"))
        .groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .agg(
            F.sum("n").cast("bigint").alias("n_nodes"),
            F.min("n").cast("bigint").alias("min_part"),
            F.max("n").cast("bigint").alias("max_part"),
        )
    )
    # empty-graph guard: n_edges = 0 makes every other aggregate NULL and
    # the div expressions NULL (or an error under ANSI mode) — emit an
    # explicit zeroed row instead, consistent with the module's k < 2
    # validation style
    return ecut.crossJoin(sizes).select(
        F.lit(k).cast("bigint").alias("k"),
        F.coalesce(F.col("n_nodes"), F.lit(0)).cast("bigint").alias("n_nodes"),
        "n_edges",
        F.coalesce(F.col("cut_edges"), F.lit(0)).cast("bigint")
        .alias("cut_edges"),
        F.expr(
            "CASE WHEN n_edges > 0 THEN (cut_edges * 1000000) div n_edges "
            "ELSE 0 END"
        ).cast("bigint").alias("cut_ppm"),
        F.coalesce(F.col("min_part"), F.lit(0)).cast("bigint")
        .alias("min_part"),
        F.coalesce(F.col("max_part"), F.lit(0)).cast("bigint")
        .alias("max_part"),
        F.expr(
            f"CASE WHEN coalesce(n_nodes, 0) > 0 "
            f"THEN (max_part * {k} * 1000000) div n_nodes ELSE 0 END"
        ).cast("bigint").alias("balance_ppm"),
    )


def reciprocity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Directed-graph reciprocity: one row (n_edges, n_reciprocal,
    reciprocity_ppm) over the distinct non-loop edge set — the classic
    dyad census ratio r = |{(u,v) : (v,u) ∈ E}| / |E| in exact integer
    ppm.  One distinct, one self-semi-join on the reversed key, two
    combinable counts; the reversed join shuffles on the edge key with no
    fan-out."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    try:
        rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        rec = e.join(rev, ["a", "b"], "left_semi")
        out = e.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges")
        ).crossJoin(
            rec.agg(F.count(F.lit(1)).cast("bigint").alias("n_reciprocal"))
        )
        # checkpoint the 1-row result so the cache can be released now
        # (the assoc.py lifecycle convention) — long-lived sessions
        # calling this in a loop must not accumulate pinned partitions
        return out.select(
            "n_edges",
            "n_reciprocal",
            F.expr(
                "CASE WHEN n_edges > 0 THEN"
                " (n_reciprocal * 1000000) div n_edges ELSE 0 END"
            ).cast("bigint").alias("reciprocity_ppm"),
        ).localCheckpoint(eager=True)
    finally:
        e.unpersist()
