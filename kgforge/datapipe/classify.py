"""Multinomial naive-Bayes text scoring — the classic fastText-free
quality/domain classifier used in corpus curation (e.g. "score every page
against a wiki-vs-spam model" filters).

Training and scoring are both expressed as DataFrame aggregations over the
token table: add-one-smoothed per-label token conditionals

    p(tok | label) = (c(label, tok) + 1) / (t(label) + V)

and document scores

    score(doc, label) = ln p(label) + Σ_tok n(doc, tok) · ln p(tok | label)

Scale shape: the model is two map-side-combinable groupBys (per-label token
counts, per-label totals) whose size is bounded by |vocab|·|labels| — it
joins back by token, and the per-doc score is ONE aggregation over
doc-token rows replicated across the (few) labels via an explicit broadcast
cross join.  Everything stays JVM-side; no Python UDFs.  Scores are rounded
to 6 decimals (ln differs in the last ulp across engines; sums here are
hundreds of terms of magnitude ~5, far inside the rounding guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def naive_bayes_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    pattern: str = "[a-z]+",
) -> DataFrame:
    """Self-train a multinomial NB model on the labeled corpus and score
    every document against every label.

    Output: ``(id, label, score, is_pred)`` — one row per document per
    label; ``is_pred`` marks the argmax by (rounded score DESC, label ASC),
    so the winner is deterministic even on exact ties.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("doc_label"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(pattern), F.lit(0)
            )
        ).alias("tok"),
    )
    doc_toks = toks.groupBy("id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    model = toks.groupBy("doc_label", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).withColumnRenamed("doc_label", "label")
    totals = toks.groupBy("doc_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    ).withColumnRenamed("doc_label", "label")
    priors = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    scalars = toks.agg(
        F.countDistinct("tok").cast("bigint").alias("v")
    ).crossJoin(docs.agg(F.count(F.lit(1)).cast("bigint").alias("nn")))

    labels = F.broadcast(
        priors.join(totals, "label").crossJoin(F.broadcast(scalars))
    )
    pairs = doc_toks.crossJoin(labels)
    joined = pairs.join(model, ["label", "tok"], "left").withColumn(
        "_c", F.coalesce(F.col("c"), F.lit(0))
    )
    term = F.col("cnt") * F.log(
        (F.col("_c") + 1).cast("double") / (F.col("t") + F.col("v"))
    )
    prior_term = F.log(F.col("nd").cast("double") / F.col("nn"))
    scored = joined.groupBy("id", "label").agg(
        F.round(F.sum(term) + F.first(prior_term), 6).alias("score")
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.col("label"))
    return scored.select(
        "id", "label", "score", (F.row_number().over(w) == 1).alias("is_pred")
    )


def knn_classify(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
) -> DataFrame:
    """k-nearest-neighbor label prediction over an embedding column:
    cosine top-k from the labeled ``train`` set, then a majority vote with
    the deterministic (votes DESC, label ASC) tie-break.

    Output: one row per test row — ``(id, pred_label, votes)``.

    Scale: this is the BRUTE-FORCE baseline (|test|·|train| fold-dot
    pairs, the same contract as ``similarity.brute_force_topk``) — at
    corpus scale route candidate generation through ``ivf_topk`` /
    LSH buckets and feed the surviving pairs to the same vote.  The vote
    itself is a map-side-combinable groupBy + one per-id window."""
    from kgforge.datapipe.similarity import _dot, _norm

    if k < 1:
        raise ValueError("k must be >= 1")
    tr = train.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).cast("array<double>").alias("bv"),
        F.col(label_col).alias("lab"),
    )
    te = test.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).cast("array<double>").alias("av"),
    )
    pairs = te.crossJoin(tr).select(
        "a",
        "b",
        "lab",
        (_dot(F.col("av"), F.col("bv")) / (_norm("av") * _norm("bv"))).alias(
            "_cos"
        ),
    )
    w = Window.partitionBy("a").orderBy(F.desc("_cos"), F.asc("b"))
    top = pairs.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    votes = top.groupBy("a", "lab").agg(
        F.count(F.lit(1)).cast("bigint").alias("votes")
    )
    wv = Window.partitionBy("a").orderBy(F.desc("votes"), F.asc("lab"))
    return (
        votes.withColumn("_vr", F.row_number().over(wv))
        .filter(F.col("_vr") == 1)
        .select(F.col("a").alias("id"), F.col("lab").alias("pred_label"), "votes")
    )


def classifier_eval(
    df: DataFrame, truth_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision/recall/F1 plus global accuracy and macro-F1 for
    a (truth, prediction) table — the evaluation mirror of
    ``cluster_pairwise_eval`` for supervised operators (naive Bayes, k-NN,
    label spreading).

    Output: one row per class appearing in truth OR prediction —
    ``(label, n_true, n_pred, tp, precision, recall, f1, accuracy,
    macro_f1)`` (the last two are global, repeated per row via a
    broadcast one-row join; precision/recall NULL when their denominator
    is 0, and such classes contribute 0 to macro-F1, the sklearn
    convention).

    Scale: one groupBy per marginal plus one on the diagonal — bounded by
    the label vocabulary; no joins wider than the class list."""
    d = df.select(
        F.col(truth_col).alias("_t"), F.col(pred_col).alias("_p")
    )
    nt = d.groupBy(F.col("_t").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    np_ = d.groupBy(F.col("_p").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pred")
    )
    tp = (
        d.filter(F.col("_t") == F.col("_p"))
        .groupBy(F.col("_t").alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("tp"))
    )
    per = (
        nt.join(np_, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).cast("bigint").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
        )
    )
    prec = F.col("tp").cast("double") / F.col("n_pred")
    rec = F.col("tp").cast("double") / F.col("n_true")
    f1 = F.when(
        (F.col("n_pred") > 0) & (F.col("n_true") > 0) & (prec + rec > 0),
        2 * prec * rec / (prec + rec),
    ).otherwise(F.lit(0.0))
    scored = per.select(
        "label",
        "n_true",
        "n_pred",
        "tp",
        F.when(F.col("n_pred") > 0, F.round(prec, 6)).alias("precision"),
        F.when(F.col("n_true") > 0, F.round(rec, 6)).alias("recall"),
        F.round(f1, 6).alias("f1"),
        f1.alias("_f1raw"),
    )
    glob = scored.agg(
        F.round(
            F.sum("tp").cast("double") / F.sum("n_true"), 6
        ).alias("accuracy"),
        F.round(F.sum("_f1raw") / F.count(F.lit(1)), 6).alias("macro_f1"),
    )
    return scored.drop("_f1raw").crossJoin(F.broadcast(glob))


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram + Brier score for a probabilistic classifier:
    does predicted probability p actually mean "right p of the time"?

    Probabilities are fixed-pointed to micro-units (``round(p·10⁶)``) so
    bin assignment is INTEGER arithmetic (``least(p_mu·bins div 10⁶,
    bins−1)`` — no float-floor boundary anywhere) and the per-bin sums and
    the global Brier sum ``Σ (p_mu − y·10⁶)²`` are exact BIGINTs
    (int64-safe to ~9·10⁶ rows per partition-free total at 10¹² per-row
    mass — switch the Brier sum to decimal(38,0) beyond ~10⁹ rows).

    Output: one row per non-empty bin ``(bin, n, mean_pred, frac_pos,
    gap, brier)`` — gap = |frac_pos − mean_pred| is the per-bin
    calibration error, brier the global score repeated per row
    (classifier_eval's broadcast-one-row convention).

    Scale: one combinable groupBy on the bin id (≤ bins rows out)."""
    p_mu = F.round(F.col(prob_col) * 1000000, 0).cast("bigint")
    y = F.when(F.col(label_col).cast("boolean"), 1).otherwise(0).cast("bigint")
    d = (
        df.filter(F.col(prob_col).isNotNull())
        .select(p_mu.alias("_p"), y.alias("_y"))
        .select(
            F.least(
                F.expr(f"(_p * {int(bins)}) div 1000000"),
                F.lit(bins - 1).cast("bigint"),
            ).alias("bin"),
            "_p",
            "_y",
        )
    )
    per = d.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_p").cast("bigint").alias("_sp"),
        F.sum("_y").cast("bigint").alias("n_pos"),
        F.sum(
            (F.col("_p") - F.col("_y") * 1000000)
            * (F.col("_p") - F.col("_y") * 1000000)
        ).cast("bigint").alias("_sq"),
    )
    glob = per.agg(
        F.round(
            F.sum("_sq").cast("double") / F.sum("n") / F.lit(1.0e12), 6
        ).alias("brier")
    )
    mean_pred = F.col("_sp").cast("double") / F.col("n") / F.lit(1.0e6)
    frac_pos = F.col("n_pos").cast("double") / F.col("n")
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(mean_pred, 6).alias("mean_pred"),
            F.round(frac_pos, 6).alias("frac_pos"),
            F.round(F.abs(frac_pos - mean_pred), 6).alias("gap"),
            "brier",
        )
    )
