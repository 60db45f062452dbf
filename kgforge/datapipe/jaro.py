"""Jaro-Winkler similarity as a pure Spark SQL expression — no Python in
the hot path, so the classic record-linkage scorer (Winkler 1990, the
census-linkage standard) runs inside whole-stage codegen on billions of
candidate pairs.

The sequential greedy matching ("smallest unmatched position within the
search window") looks imperative, but both matched-position sets fit in
ONE int64 bitmask each for strings ≤ 60 chars, so the whole algorithm is
two nested ``aggregate`` folds over index sequences:

    outer fold  over s1 positions carrying (mask2, mask1, count)
    inner fold  over the window [i−sr, i+sr] finding the first unmatched
                equal character and setting its bit (a 'found' flag in
                the accumulator stops the scan; the finish lambda drops
                the flag so the inner fold IS the outer step)

then two extraction folds rebuild the matched-character strings and one
fold counts transpositions.  Convention calibrated fuzz-exact against
DuckDB's native ``jaro_winkler_similarity`` (3000 random pairs, 1e-12):
search range ``max(l1,l2) div 2 − 1`` clamped at 0, window inclusive,
transpositions = mismatches div 2, Winkler boost (ℓ ≤ 4, p = 0.1) only
when jaro > 0.7.

Strings are capped at 60 chars (bit 61+ would overflow the mask); the
join helper applies the cap itself — for longer fields, block on a
fingerprint first and run JW on the capped head as the tie-breaker.

Scale: the join helper is blocked equi-join + expression filter — the
pair count is Σ block², controlled by the caller's blocking key exactly
like the Soundex/SNM blockers; the scorer itself adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LEN = 60

_BIT = "shiftleft(CAST(1 AS BIGINT), {})"


def _check_ident(*cols: str) -> None:
    for c in cols:
        if not c.replace("_", "").isalnum():
            raise ValueError(f"column name {c!r} must be a simple identifier")


def with_jaro_winkler(
    pairs: DataFrame, s1: str, s2: str, out: str = "jw"
) -> DataFrame:
    """Append a raw-double Jaro-Winkler column ``out`` to a pair
    DataFrame.  ``s1``/``s2`` must be simple column names (they are
    re-written in place with the MAX_LEN cap applied); helper columns are
    dropped."""
    _check_ident(s1, s2)
    d = pairs.withColumn(s1, F.expr(f"substr({s1}, 1, {MAX_LEN})")).withColumn(
        s2, F.expr(f"substr({s2}, 1, {MAX_LEN})")
    )
    d = d.withColumn(
        "_sr",
        F.expr(
            f"greatest(greatest(length({s1}), length({s2})) div 2 - 1, 0)"
        ).cast("int"),
    )
    inner = f"""
      aggregate(
        sequence(greatest(1, i - _sr), least(length({s2}), i + _sr)),
        named_struct('mk', acc.mk, 'mi', acc.mi, 'cnt', acc.cnt, 'f', 0),
        (a2, j) -> CASE
          WHEN a2.f = 1 THEN a2
          WHEN substr({s2}, j, 1) = substr({s1}, i, 1)
               AND (a2.mk & {_BIT.format('j')}) = 0
          THEN named_struct('mk', a2.mk | {_BIT.format('j')},
                            'mi', a2.mi | {_BIT.format('i')},
                            'cnt', a2.cnt + 1, 'f', 1)
          ELSE a2 END,
        af -> named_struct('mk', af.mk, 'mi', af.mi, 'cnt', af.cnt))
    """
    d = d.withColumn(
        "_mm",
        F.expr(
            f"""
    aggregate(
      sequence(1, length({s1})),
      named_struct('mk', CAST(0 AS BIGINT), 'mi', CAST(0 AS BIGINT),
                   'cnt', 0),
      (acc, i) -> CASE
        WHEN length({s1}) = 0
          OR greatest(1, i - _sr) > least(length({s2}), i + _sr) THEN acc
        ELSE {inner} END)
    """
        ),
    )
    extract = (
        "CASE WHEN length({s}) = 0 THEN '' ELSE "
        "aggregate(sequence(1, length({s})), '', "
        "(a, p) -> CASE WHEN (_mm.{mcol} & " + _BIT.format("p") + ") <> 0 "
        "THEN concat(a, substr({s}, p, 1)) ELSE a END) END"
    )
    d = d.withColumn("_m1s", F.expr(extract.format(s=s1, mcol="mi")))
    d = d.withColumn("_m2s", F.expr(extract.format(s=s2, mcol="mk")))
    d = d.withColumn(
        "_t2",
        F.expr(
            "CASE WHEN _mm.cnt = 0 THEN 0 ELSE aggregate("
            "sequence(1, _mm.cnt), 0, (a, k) -> a + CASE WHEN "
            "substr(_m1s, k, 1) <> substr(_m2s, k, 1) THEN 1 ELSE 0 END)"
            " END"
        ),
    )
    d = d.withColumn(
        "_jaro",
        F.expr(
            f"""
      CASE WHEN _mm.cnt = 0 THEN CAST(0.0 AS DOUBLE)
      ELSE (CAST(_mm.cnt AS DOUBLE) / length({s1})
            + CAST(_mm.cnt AS DOUBLE) / length({s2})
            + CAST(_mm.cnt - _t2 div 2 AS DOUBLE) / _mm.cnt)
           / CAST(3.0 AS DOUBLE) END
    """
        ),
    )
    d = d.withColumn(
        "_pfx",
        F.expr(
            f"aggregate(sequence(1, 4), 0, (a, k) -> CASE WHEN a = k - 1"
            f" AND k <= length({s1}) AND k <= length({s2})"
            f" AND substr({s1}, k, 1) = substr({s2}, k, 1) THEN k"
            f" ELSE a END)"
        ),
    )
    d = d.withColumn(
        out,
        F.expr(
            """
      CASE WHEN _jaro > CAST(0.7 AS DOUBLE)
           THEN _jaro + CAST(0.1 AS DOUBLE) * _pfx
                * (CAST(1.0 AS DOUBLE) - _jaro)
           ELSE _jaro END
    """
        ),
    )
    return d.drop("_sr", "_mm", "_m1s", "_m2s", "_t2", "_jaro", "_pfx")


def jaro_winkler_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.86,
) -> DataFrame:
    """Blocked Jaro-Winkler similarity join: pairs (id_a < id_b) within the
    same block scoring ``round(jw, 6) >= threshold``.

    Output: ``(id_a, id_b, jw)``, jw rounded to 6.

    Scale: pair count is Σ block² — choose ``block_col`` (brand, Soundex,
    SNM window, LSH bucket) so blocks stay bounded; the scorer is
    expression-only on top of the blocked self-join."""
    a = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("ta"),
    )
    b = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("tb"),
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    scored = with_jaro_winkler(pairs, "ta", "tb", out="_jw")
    return (
        scored.withColumn("jw", F.round(F.col("_jw"), 6))
        .filter(F.col("jw") >= threshold)
        .select("id_a", "id_b", "jw")
    )
