"""Exact set-similarity join with prefix filtering (PPJoin family).

All pairs of documents whose TOKEN SETS have Jaccard >= tau, computed
exactly — the deterministic complement to MinHash-LSH (which trades
recall for speed).  The candidate bound is the prefix-filter theorem
(Chaudhuri/Ganti/Kaushik 2006; Bayardo/Ma/Srikant 2007; Xiao et al.'s
PPJoin): order every set by one GLOBAL token order (rarest token first)
and keep each set's first ``|x| - ceil(tau·|x|) + 1`` tokens; any pair
with Jaccard >= tau has intersection >= ceil(tau·max(|a|,|b|)), which
cannot fit inside both suffixes, so the pair shares a PREFIX token.
Joining prefixes on the rare end of the frequency ladder is what keeps
the candidate set near-linear — stopword-like tokens never enter a
prefix unless a set is almost all stopwords.

Scale shape: one token-frequency aggregate, one per-doc window (bounded
by the doc's token count) to rank tokens, one equi-join on prefix
tokens, one counting join to verify — never an all-pairs product; the
verify join touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def set_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
) -> DataFrame:
    """``(a, b, inter, union_n, jaccard)`` for every pair with
    whitespace-token-SET Jaccard >= ``threshold`` (0 < t <= 1, ``a <
    b``).  Exact: prefix filtering has no false negatives and every
    candidate is verified."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col(text_col))), " ")
                )
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .localCheckpoint(eager=True)
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_f"))
    w = Window.partitionBy("id").orderBy(F.col("_f"), F.col("tok"))
    ranked = (
        toks.join(freq, "tok")
        .join(sizes, "id")
        .withColumn("_r", F.row_number().over(w))
    )
    # prefix length |x| - ceil(t*|x|) + 1 (exact: ceil via integer div);
    # the DECIMAL reading of the threshold (0.7 ⇒ 7/10, not the binary
    # float ratio, whose 2^52-scale terms would overflow n·t_num)
    from fractions import Fraction

    frac = Fraction(str(threshold))
    t_num, t_den = frac.numerator, frac.denominator
    # ceil(a/b) for positive longs under Spark's truncating `div`
    ceil_tn = F.expr(
        f"CAST(({t_num} * n + {t_den} - 1) div {t_den} AS BIGINT)"
    )
    prefix = ranked.filter(F.col("_r") <= F.col("n") - ceil_tn + 1)
    cand = (
        prefix.select(F.col("id").alias("a"), "tok")
        .join(prefix.select(F.col("id").alias("b"), "tok"), "tok")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    inter = (
        cand.join(toks.select(F.col("id").alias("a"), "tok"), "a")
        .join(toks.select(F.col("id").alias("b"), "tok"), ["b", "tok"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("id").alias("a"), F.col("n").alias("_na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n").alias("_nb"))
    out = (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn("union_n", F.col("_na") + F.col("_nb") - F.col("inter"))
        # integer cross-multiplication: inter/union >= t_num/t_den
        .filter(
            F.col("inter") * F.lit(t_den) >= F.col("union_n") * F.lit(t_num)
        )
    )
    return out.select(
        "a",
        "b",
        F.col("inter").cast("bigint").alias("inter"),
        F.col("union_n").cast("bigint").alias("union_n"),
        F.round(
            F.col("inter").cast("double") / F.col("union_n").cast("double"), 6
        ).alias("jaccard"),
    )


def containment_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
) -> DataFrame:
    """Asymmetric containment join: ``(a, b, n_a, inter,
    containment_ppm)`` for every ordered pair a ≠ b with
    |A ∩ B| / |A| ≥ threshold over whitespace-token SETS — the
    subset-document detector (near-complete containment catches quotes,
    excerpts, and supersets that symmetric Jaccard misses; Broder 1997
    distinguishes exactly this *containment* from *resemblance*).

    Prefix filter, asymmetric form: a qualifying pair has intersection ≥
    ceil(t·|A|), which cannot fit entirely in A's suffix of length
    |A| − ceil(t·|A|), so A must share one of its first
    |A| − ceil(t·|A|) + 1 rarest tokens with B — only the CONTAINED side
    is prefix-pruned; the containing side indexes every token (it has no
    size bound).  Candidates verify with an exact counting join;
    containment is reported as the exact integer ``inter·10⁶ div n_a``.

    Scale shape: same ladder as :func:`set_similarity_join` — frequency
    aggregate, bounded per-doc window, equi-join rare-prefix × full
    index, verify on candidates only."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    from fractions import Fraction

    frac = Fraction(str(threshold)).limit_denominator(1_000_000)
    tn, td = frac.numerator, frac.denominator
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col(text_col))), " ")
                )
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .localCheckpoint(eager=True)
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_f"))
    w = Window.partitionBy("id").orderBy(F.col("_f"), F.col("tok"))
    ranked = (
        toks.join(freq, "tok")
        .join(sizes, "id")
        .withColumn("_r", F.row_number().over(w))
    )
    # ceil(t·n) = (n·tn + td − 1) div td — exact on the decimal reading
    prefix_a = ranked.filter(
        F.col("_r") <= F.col("n") - F.expr(f"(n * {tn} + {td} - 1) div {td}") + 1
    ).select(F.col("id").alias("a"), "tok", F.col("n").alias("n_a"))
    index_b = toks.select(F.col("id").alias("b"), "tok")
    cand = (
        prefix_a.join(index_b, "tok")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", "n_a")
        .distinct()
    )
    # verify on candidates only (same ladder as set_similarity_join):
    # expand each candidate pair by a's tokens, keep those b also has —
    # the counting join never touches a non-candidate pair
    inter = (
        cand.join(toks.select(F.col("id").alias("a"), "tok"), "a")
        .join(toks.select(F.col("id").alias("b"), "tok"), ["b", "tok"])
        .groupBy("a", "b", "n_a")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    return (
        inter.filter(F.col("inter") * td >= F.col("n_a") * tn)
        .select(
            "a", "b", F.col("n_a").cast("bigint").alias("n_a"), "inter",
            F.expr("(inter * 1000000) div n_a").cast("bigint")
            .alias("containment_ppm"),
        )
    )
