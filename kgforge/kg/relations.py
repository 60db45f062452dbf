"""Surface-pattern relation extraction over document text.

The reference's pipeline surface stops at typed attribute triples
(``data/QueryBuildingService.java`` builds per-attribute SPARQL; no
relation mining exists there); a KG *construction* pipeline additionally
needs the classic bootstrapping step that proposes (subj, pred, obj)
candidates between entity mentions — Hearst (1992) lexico-syntactic
patterns, DIPRE (Brin 1998), Snowball (Agichtein & Gravano 2000).  This
module is that step, re-derived for Spark:

- every pattern is an RE2-safe regular expression with exactly TWO
  capture groups (subject NP, object NP) — no lookaround, no
  backreferences, so the SAME pattern text runs identically under
  java.util.regex (Spark codegen) and RE2 (the DuckDB oracle);
- ALL patterns are evaluated in ONE corpus scan: a single projection
  computes each pattern's subject/object arrays via two
  ``regexp_extract_all`` calls, the per-pattern arrays are zipped into
  (pred, subj, obj) structs, concatenated, and exploded once.  The scan
  is map-only JVM work — the first (and only) shuffle is the final
  map-side-combinable support aggregation;
- support counting (``relation_support``) is a plain groupBy — at
  100 TB the candidate stream is a small fraction of corpus bytes
  (pattern hits only), and the aggregate partial-combines per partition
  before the exchange.

The noun-phrase shape is the usual capitalized-sequence approximation
(``[A-Z][A-Za-z0-9]* ( [A-Z][A-Za-z0-9]*)*``) — deterministic, engine
portable, and honest about being a *candidate* generator: downstream
confidence comes from corpus-wide support, exactly as in the public
bootstrapping literature.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Capitalized noun-phrase approximation.  RE2-safe: character classes and
# a non-capturing group only.  NO '.' or ',' inside, so sentence
# punctuation bounds every phrase.
NP = "[A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*)*"

# (predicate, pattern-with-two-capture-groups).  Case-sensitive on
# purpose: the anchors ("CEO of", "acquired") are the high-precision
# part of surface patterns, and case-folding them costs precision for
# no recall on real prose.
DEFAULT_RELATION_PATTERNS: tuple[tuple[str, str], ...] = (
    ("ceo_of", f"({NP}), CEO of ({NP})"),
    ("acquired", f"({NP}) acquired ({NP})"),
    ("based_in", f"({NP}) is based in ({NP})"),
    ("founded_by", f"({NP}) was founded by ({NP})"),
)


def _check_pattern(pred: str, pat: str) -> None:
    if re.compile(pat).groups != 2:
        raise ValueError(
            f"relation pattern {pred!r} must have exactly 2 capture groups"
        )
    if "'" in pat or "\\" in pat:
        raise ValueError(
            f"relation pattern {pred!r}: quotes/backslashes break the "
            "engine-portable inline form — extend the escaping first"
        )


def extract_relation_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: tuple[tuple[str, str], ...] | None = None,
) -> DataFrame:
    """(id, pred, subj, obj) — one row per pattern match, one corpus scan.

    Matches are emitted in document order per pattern (the order
    ``regexp_extract_all`` finds them), but downstream support counting
    is order-free, so the operator is partition-invariant.
    """
    pats = list(patterns if patterns is not None else DEFAULT_RELATION_PATTERNS)
    for pred, pat in pats:
        _check_pattern(pred, pat)

    proj = [F.col(id_col).alias("id")]
    legs = []
    for i, (pred, pat) in enumerate(pats):
        proj.append(
            F.expr(f"regexp_extract_all({text_col}, '{pat}', 1)").alias(f"_s{i}")
        )
        proj.append(
            F.expr(f"regexp_extract_all({text_col}, '{pat}', 2)").alias(f"_o{i}")
        )
        # sequence(1, 0) DESCENDS in Spark — guard the empty case; the
        # NULL arm is explicit because under spark.sql.legacy.sizeOfNull
        # size(NULL) = -1 would fall to the ELSE branch and
        # sequence(1, -1) would emit junk descending rows
        legs.append(
            f"CASE WHEN _s{i} IS NULL OR size(_s{i}) = 0 THEN "
            f"array() "
            f"ELSE transform(sequence(1, size(_s{i})), "
            f"n -> struct('{pred}' AS pred, _s{i}[n-1] AS subj, _o{i}[n-1] AS obj)) END"
        )
    with_arrays = df.select(*proj)
    exploded = with_arrays.select(
        "id", F.explode(F.expr("concat(" + ", ".join(legs) + ")")).alias("m")
    )
    return exploded.select(
        "id",
        F.col("m.pred").alias("pred"),
        F.col("m.subj").alias("subj"),
        F.col("m.obj").alias("obj"),
    )


def relation_support(candidates: DataFrame) -> DataFrame:
    """Corpus-wide evidence per distinct (pred, subj, obj): total match
    count and distinct supporting documents.  Map-side combinable; the
    distinct-doc count is exact (the candidate stream is already the
    pattern-hit minority, so this is not a corpus-sized distinct)."""
    return candidates.groupBy("pred", "subj", "obj").agg(
        F.count(F.lit(1)).alias("support"),
        F.countDistinct("id").alias("n_docs"),
    )


def relations_to_triples(
    support: DataFrame,
    min_support: int = 1,
    namespace: str = "urn:kgforge:rel:",
) -> DataFrame:
    """Promote supported candidates to canonical triple rows
    (subject/predicate/object IRIs in ``namespace``, surface text kept as
    the local name with spaces percent-encoded) so they union into the
    triple table the rest of ``kgforge.kg`` operates on."""
    enc = lambda c: F.concat(F.lit(namespace), F.regexp_replace(c, " ", "%20"))
    return (
        support.filter(F.col("support") >= min_support)
        .select(
            enc(F.col("subj")).alias("subject"),
            enc(F.col("pred")).alias("predicate"),
            enc(F.col("obj")).alias("object"),
            F.col("support"),
        )
    )
