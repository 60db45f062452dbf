"""Retrieval-stack operators: BM25 scoring, reciprocal-rank fusion, MMR.

The ranking layer a RAG / search pipeline runs after candidate
generation: lexical scoring (BM25 — the Robertson/Spärck-Jones weighting
in its Lucene form), multi-retriever merging (RRF — Cormack, Clarke &
Büttcher 2009), and diversity re-ranking (maximal marginal relevance —
Carbonell & Goldstein 1998).

Determinism discipline (the repo convention): integer inputs stay
integer as long as possible; every float is ONE shared closed-form
expression per operator (BM25's ln is absorbed by round-6; RRF's
reciprocal sum folds over a SORTED list so addition order is fixed; MMR
compares scores built from left-fold dot products, which are bit-exact
across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgforge.datapipe.similarity import _dot, _norm


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``(id, score)`` for every document matching >= 1 query term.

    Lucene-shaped BM25: ``idf_t = ln(1 + (N - df_t + 0.5)/(df_t +
    0.5))``, ``score = Σ_t idf_t · tf_t(k1+1) / (tf_t + k1(1 - b +
    b·dl·N/Σdl))`` — ``avgdl`` enters as the exact integer pair
    ``(N, Σdl)``, never a pre-divided float.

    Scale shape: term frequencies are per-row ARRAY expressions (no
    explode, no shuffle for tf), corpus statistics are ONE map-side-
    combinable aggregate broadcast back — two jobs total, all codegen,
    O(|query|) expressions per row."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")

    def _tf(term: str):
        # NOTE: a two-arg lambda would make PySpark pass (element, index)
        # — the closure keeps filter() in one-arg element form
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    d = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("bigint").alias("dl"),
        *[
            _tf(t).cast("bigint").alias(f"_tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("bigint")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    j = d.crossJoin(F.broadcast(stats))
    n = F.col("_n").cast("double")
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (n - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b)
            * F.col("dl").cast("double")
            * n
            / F.col("_sumdl").cast("double")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / denom
    matched = sum(
        (F.col(f"_tf{i}") > 0).cast("int") for i in range(len(query_terms))
    )
    return (
        j.withColumn("_m", matched)
        .filter(F.col("_m") > 0)
        .select("id", F.round(score, 6).alias("score"))
    )


def rrf_fuse(
    scored: DataFrame,
    retriever_col: str,
    id_col: str,
    score_col: str,
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of per-retriever rankings:
    ``rrf(d) = Σ_lists 1/(k + rank_list(d))`` (rank 1-based by score
    descending, id ascending).  Returns ``(id, n_lists, rrf)``.

    The reciprocal sum folds over the SORTED rank list, so float
    addition order is fixed — reproducible across engines and
    partitionings.  Scale: one window per retriever (bounded by that
    retriever's list) + one groupBy over documents."""
    w = Window.partitionBy(retriever_col).orderBy(
        F.desc(score_col), F.col(id_col)
    )
    ranked = scored.select(
        F.col(id_col).alias("id"),
        F.row_number().over(w).cast("bigint").alias("_rank"),
    )
    fold = F.aggregate(
        F.sort_array(F.collect_list("_rank")),
        F.lit(0.0),
        lambda acc, r: acc + F.lit(1.0) / (F.lit(float(k)) + r.cast("double")),
    )
    return ranked.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.round(fold, 6).alias("rrf"),
    )


def mmr_select(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 8,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-marginal-relevance selection: greedily pick ``k`` items
    maximizing ``lam·cos(q, d) − (1−lam)·max_{s∈selected} cos(d, s)``
    (ties by id) — the diversity re-ranker between retrieval and the
    context window.

    MMR is inherently sequential in k; each of the k steps is one
    distributed argmax (the candidate set never leaves the cluster, the
    selected set is a <= k-row broadcast).  All cosines are left-fold
    dot products over double arrays — bit-exact across engines, so the
    greedy trace is a pure function of the data."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    qn = float(sum(float(x) * float(x) for x in query)) ** 0.5
    v = F.col(vec_col).cast("array<double>")
    qarr = F.array(*[F.lit(float(x)) for x in query])
    cand = df.select(
        F.col(id_col).alias("id"),
        v.alias("_v"),
        (_dot(v, qarr) / (_norm(v) * F.lit(qn))).alias("_rel"),
    ).localCheckpoint(eager=True)
    picked = []  # (rank, id, score) driver-side, <= k rows
    sel_vecs = None
    for step in range(k):
        if sel_vecs is None:
            scored = cand.withColumn("_score", F.lit(lam) * F.col("_rel"))
        else:
            sims = (
                cand.crossJoin(F.broadcast(sel_vecs))
                .select(
                    "id",
                    (
                        _dot(F.col("_v"), F.col("_sv"))
                        / (_norm(F.col("_v")) * F.col("_svn"))
                    ).alias("_s"),
                )
                .groupBy("id")
                .agg(F.max("_s").alias("_maxsim"))
            )
            scored = cand.join(sims, "id").withColumn(
                "_score",
                F.lit(lam) * F.col("_rel")
                - F.lit(1.0 - lam) * F.col("_maxsim"),
            )
        top = (
            scored.orderBy(F.desc("_score"), F.col("id"))
            .limit(1)
            .select("id", "_v", "_score", _norm(F.col("_v")).alias("_vn"))
            .collect()
        )
        if not top:
            break
        row = top[0]
        picked.append((step + 1, row["id"], row["_score"]))
        one = df.sparkSession.createDataFrame(
            [(row["_v"], row["_vn"])], "_sv array<double>, _svn double"
        )
        sel_vecs = one if sel_vecs is None else sel_vecs.unionByName(one)
        cand = cand.filter(F.col("id") != F.lit(row["id"]))
    out = df.sparkSession.createDataFrame(
        [(r, i, s) for r, i, s in picked],
        f"rank bigint, id {dict(df.dtypes)[id_col]}, score double",
    )
    return out.select("rank", "id", F.round("score", 6).alias("score"))
