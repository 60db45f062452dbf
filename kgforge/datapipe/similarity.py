"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-only (`zip_with` dot product + `aggregate`)
  against a broadcast query set — the correctness baseline
- LSH-bucketed ANN: random-hyperplane signatures → bucket equi-join →
  exact cosine rerank — the scale path (candidates bounded by bucket size)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.synth import _splitmix64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_cosine(df: DataFrame, vec_col: str, query: list[float],
                out: str = "cosine") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = sum(x * x for x in query) ** 0.5
    return df.withColumn(
        out,
        _dot(F.col(vec_col).cast("array<double>"), q)
        / (_norm(F.col(vec_col).cast("array<double>")) * F.lit(qn)),
    )


def brute_force_topk(df: DataFrame, id_col: str, vec_col: str,
                     query: list[float], k: int = 10) -> DataFrame:
    """Exact top-k by cosine — full scan, JVM expressions only."""
    scored = with_cosine(df, vec_col, query)
    return (
        scored.select(F.col(id_col).alias("id"), "cosine")
        .orderBy(F.desc("cosine"), F.col("id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> list[list[float]]:
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = _splitmix64(seed * 1_000_003 + p * 131 + d)
            row.append((h / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signature(df: DataFrame, vec_col: str, dim: int, n_planes: int = 12,
                  seed: int = 11, out: str = "bucket") -> DataFrame:
    """Random-hyperplane signature packed into one integer bucket id."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    v = F.col(vec_col).cast("array<double>")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(v, p) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + bit * F.lit(1 << i).cast("long")
    return df.withColumn(out, sig)


def ann_topk(df: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
             dim: int, k: int = 10, n_planes: int = 10,
             multi_probe: bool = False) -> DataFrame:
    """ANN: bucket-join queries to corpus on the hyperplane signature, exact
    cosine rerank inside buckets, top-k per query via window.

    ``multi_probe=True`` also probes every bucket at Hamming distance 1 from
    the query's signature (n_planes extra probes per query): near-boundary
    neighbors that one flipped hyperplane bit would miss are recovered,
    lifting recall at a ×(n_planes+1) candidate cost on the (broadcast
    query-side) join only — the corpus is still hashed once and shuffled
    once on the bucket key.  A corpus vector lives in exactly one bucket, so
    probes never produce duplicate candidates.
    """
    from pyspark.sql import Window as W

    # norms are computed ONCE per row before the join — recomputing the
    # fold inside the pair-scoring expression would redo it per candidate
    corpus = lsh_signature(df, vec_col, dim, n_planes).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        "bucket",
    ).withColumn("cn", _norm(F.col("cvec")))
    qs = lsh_signature(queries, vec_col, dim, n_planes).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        "bucket",
    ).withColumn("qn", _norm(F.col("qvec")))
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_planes)
            ],
        )
        qs = qs.withColumn("bucket", F.explode(probes))
    joined = corpus.join(F.broadcast(qs), "bucket")
    scored = joined.withColumn(
        "cosine", _dot(F.col("cvec"), F.col("qvec")) / (F.col("cn") * F.col("qn"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("cid").alias("id"), "cosine", "rk")
    )


def embedding_near_duplicates_exact(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9
) -> DataFrame:
    """Exact all-pairs cosine near-dups — the correctness baseline for the LSH
    variant.  Broadcast-nested-loop on (a < b); use only for corpora that fit
    a broadcast (the LSH path is the scale path)."""
    a = df.select(
        F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    b = df.select(
        F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    cand = a.join(F.broadcast(b), F.col("a") < F.col("b"))
    scored = cand.withColumn(
        "cosine", _dot(F.col("va"), F.col("vb")) / (_norm("va") * _norm("vb"))
    )
    return scored.filter(F.col("cosine") >= threshold).select("a", "b", "cosine")


def embedding_near_duplicates(df: DataFrame, id_col: str, vec_col: str, dim: int,
                              threshold: float = 0.95, n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets + exact rerank."""
    sig = lsh_signature(df, vec_col, dim, n_planes).withColumn(
        "_vd", F.col(vec_col).cast("array<double>")
    ).withColumn("_nd", _norm(F.col("_vd")))
    a = sig.select(F.col(id_col).alias("a"), F.col("_vd").alias("va"),
                   F.col("_nd").alias("na"), "bucket")
    b = sig.select(F.col(id_col).alias("b"), F.col("_vd").alias("vb"),
                   F.col("_nd").alias("nb"), "bucket")
    cand = a.join(b, "bucket").filter(F.col("a") < F.col("b"))
    scored = cand.withColumn(
        "cosine", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    )
    return scored.filter(F.col("cosine") >= threshold).select("a", "b", "cosine")


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str, centroids,
                   threshold: float = 0.8) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, re-derived):
    assign every vector to its nearest centroid by cosine (ties → lowest
    centroid id), then WITHIN each cell mark a vector as a duplicate when
    some lower-id vector of the same cell has cosine ≥ ``threshold``; the
    surviving anchor reported is the lowest such partner id.

    Scale: the corpus-wide all-pairs comparison never happens — candidates
    are bounded by cell membership (≈ n/k per cell), costing one broadcast
    (centroid table) + one shuffle (cell id) + a within-cell self-join:
    the same shape as the LSH near-dup path, but in embedding space where
    trained cells give much tighter candidate sets than random hyperplanes.
    Returns (id, cell, keep, dup_of, dup_cosine)."""
    from pyspark.sql import Window as W

    cents = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        schema="cent_id long, cent_vec array<double>",
    ).withColumn("cent_norm", _norm(F.col("cent_vec")))
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_nv", _norm(F.col("_v")))
    scored = base.join(F.broadcast(cents)).withColumn(
        "_ccos", _dot(F.col("_v"), F.col("cent_vec"))
        / (F.col("_nv") * F.col("cent_norm")),
    )
    w = W.partitionBy("id").orderBy(F.desc("_ccos"), F.col("cent_id"))
    assigned = (
        scored.withColumn("_crk", F.row_number().over(w))
        .filter(F.col("_crk") == 1)
        .select("id", "_v", "_nv", F.col("cent_id").alias("cell"))
    )
    a = assigned.select(F.col("id").alias("a"), F.col("_v").alias("va"),
                        F.col("_nv").alias("na"), "cell")
    b = assigned.select(F.col("id").alias("b"), F.col("_v").alias("vb"),
                        F.col("_nv").alias("nb"), "cell")
    pairs = (
        a.join(b, "cell")
        .filter(F.col("b") < F.col("a"))
        .withColumn("cosine", _dot(F.col("va"), F.col("vb"))
                    / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
    )
    # min(struct) picks the lowest partner id and carries ITS cosine along
    dups = pairs.groupBy("a").agg(
        F.min(F.struct(F.col("b"), F.col("cosine"))).alias("_m")
    )
    return (
        assigned.join(dups, assigned["id"] == dups["a"], "left")
        .select(
            "id", "cell",
            F.col("_m").isNull().alias("keep"),
            F.col("_m")["b"].alias("dup_of"),
            F.round(F.col("_m")["cosine"], 6).alias("dup_cosine"),
        )
    )


def train_centroids_numpy(vectors, n_centroids: int, iters: int = 8):
    """Deterministic spherical k-means on a (driver-sized) training sample.

    Pure numpy over the vectors in the given order: init = first
    ``n_centroids`` vectors, assignment by cosine (ties → lowest centroid
    index), update = member mean (an empty cell keeps its centroid).  Bit
    deterministic — same sample order in, same float64 centroids out — so a
    SQL oracle fed the same literals agrees with Spark by construction.
    Training on a bounded deterministic sample is the standard IVF recipe
    (the full corpus never fits on the driver; assignment, multi-probe and
    rerank stay distributed)."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    n = len(X)
    k = min(n_centroids, n)
    if k == 0:
        return []
    C = X[:k].copy()
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    for _ in range(iters):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
        # argmax cosine; np.argmax takes the FIRST max → lowest centroid idx
        assign = np.argmax(Xn @ Cn.T, axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return [[float(x) for x in row] for row in C]


def ivf_topk(df: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
             k: int = 10, n_centroids: int = 16, n_probe: int = 2,
             centroids=None) -> DataFrame:
    """IVF-style ANN: partition the corpus into centroid cells, probe the
    ``n_probe`` nearest cells per query, exact-cosine rerank inside them.

    ``centroids`` (list of vectors, e.g. from :func:`train_centroids_numpy`
    over a deterministic sample) supplies trained cells; without it the
    vectors with the ``n_centroids`` smallest ids act as deterministic seed
    centroids.  Either way candidate generation is one broadcast of the
    centroid table + one shuffle on the cell id, bounding the scan to
    |corpus|/cells × probes at scale."""
    from pyspark.sql import Window as W

    if centroids is not None:
        cents = df.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            schema="cent_id long, cent_vec array<double>",
        )
    else:
        cents = df.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).cast("array<double>").alias("cent_vec"),
        )
    # centroid norms fold ONCE per centroid row here, not per (row, centroid)
    # candidate — same JVM fold over the same values, so assignment cosines
    # are bit-identical to inline evaluation (oracle parity unchanged)
    cents = cents.withColumn("cent_norm", _norm(F.col("cent_vec")))

    def _assign(side: DataFrame, out_id: str, probes: int) -> DataFrame:
        j = side.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).withColumn("_nv", _norm(F.col("_v"))).join(F.broadcast(cents))
        scored = j.withColumn(
            "_ccos", _dot(F.col("_v"), F.col("cent_vec"))
            / (F.col("_nv") * F.col("cent_norm")),
        )
        w = W.partitionBy(out_id).orderBy(F.desc("_ccos"), F.col("cent_id"))
        return (
            scored.withColumn("_crk", F.row_number().over(w))
            .filter(F.col("_crk") <= probes)
            .select(out_id, "_v", "_nv", "cent_id")
        )

    corpus = _assign(df, "cid", 1)
    qs = _assign(queries, "qid", n_probe)
    joined = corpus.join(
        qs.select("qid", F.col("_v").alias("_qv"), F.col("_nv").alias("_qn"), "cent_id"),
        "cent_id",
    )
    scored = joined.withColumn(
        "cosine", _dot(F.col("_v"), F.col("_qv")) / (F.col("_nv") * F.col("_qn"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("cid").alias("id"), "cosine", "rk")
    )
