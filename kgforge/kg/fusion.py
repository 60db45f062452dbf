"""Knowledge fusion / truth discovery over conflicting assertions.

When a KG ingests the same fact key (subject, predicate) from many
sources, the values conflict and somebody has to pick.  The public
literature's answer is joint source-reliability / claim-confidence
estimation — TruthFinder (Yin, Han & Yu 2008), the Sums/Average·Log
family (Pasternack & Roth 2010), and the knowledge-fusion study of Dong
et al. 2014.  This module implements the Sums-style fixed point:

    conf(k, v)  =  Σ_{s asserts (k,v)} trust(s)        (then normalized
                   per key so competing values split 10⁶ between them)
    trust(s)    =  mean over s's claims of conf(k, v)

iterated a fixed number of rounds from uniform trust — reliable sources
(those agreeing with the emerging majority) gain trust, and their claims
gain confidence, which is exactly the voting-with-reputation behavior
the papers derive.

Determinism discipline: trust and confidence live in integer micro-units
(init 10⁶, normalization and means via ``div``) — every step is an
integer sum or integer division, so results are bit-identical across
engines and partitionings, and the DuckDB oracle unrolls the rounds as
MATERIALIZED CTEs.

Scale shape per round: two map-side-combinable groupBys (claim
confidence, per-key normalizer) and one groupBy per source for the trust
update — all keyed shuffles, no driver collect inside the loop; state is
lineage-truncated per round (reliable ``checkpoint`` when the session
has a checkpoint dir, else ``localCheckpoint``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgforge.util import truncate_lineage

MICRO = 1_000_000


def truth_discovery(
    assertions: DataFrame,
    key_cols: list[str],
    value_col: str,
    source_col: str,
    iterations: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """→ (claim_conf, source_trust).

    ``claim_conf``: (*key_cols, value, conf_micro, n_sources) — the
    per-key-normalized confidence of every distinct asserted value after
    ``iterations`` rounds (competing values for one key sum to ≤ 10⁶, up
    to truncation).  ``source_trust``: (source, trust_micro, n_claims).

    Duplicate (source, key, value) assertions collapse — a source gets
    one vote per claim, the relation is a set.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    a = assertions.select(
        F.col(source_col).alias("source"),
        *[F.col(c) for c in key_cols],
        F.col(value_col).alias("value"),
    ).distinct().persist()
    try:
        n_claims = a.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_claims")
        )
        trust = n_claims.select(
            "source", F.lit(MICRO).cast("bigint").alias("trust_micro")
        )
        trust = truncate_lineage(trust)
        conf = None
        for _ in range(iterations):
            craw = (
                a.join(trust, "source")
                .groupBy(*key_cols, "value")
                .agg(
                    F.sum("trust_micro").cast("bigint").alias("_cr"),
                    F.count(F.lit(1)).cast("bigint").alias("n_sources"),
                )
            )
            keysum = craw.groupBy(*key_cols).agg(
                F.sum("_cr").cast("bigint").alias("_ks")
            )
            conf = craw.join(keysum, key_cols).select(
                *key_cols,
                "value",
                F.expr(f"(_cr * {MICRO}) div _ks").cast("bigint")
                .alias("conf_micro"),
                "n_sources",
            )
            conf = truncate_lineage(conf)
            trust = (
                a.join(conf, [*key_cols, "value"])
                .groupBy("source")
                .agg(F.sum("conf_micro").cast("bigint").alias("_tc"))
                .join(n_claims, "source")
                .select(
                    "source",
                    F.expr("_tc div n_claims").cast("bigint")
                    .alias("trust_micro"),
                )
            )
            trust = truncate_lineage(trust)
        source_trust = trust.join(n_claims, "source").select(
            "source", "trust_micro", "n_claims"
        )
        return conf, source_trust
    finally:
        a.unpersist()


def resolve_conflicts(claim_conf: DataFrame, key_cols: list[str]) -> DataFrame:
    """Winner per key: highest confidence, ties to the lexicographically
    smallest value — (*key_cols, value, conf_micro, n_sources).  The
    window partitions by the fact key (bounded groups: one row per
    distinct asserted value), never globally."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc("conf_micro"), F.asc("value")
    )
    return (
        claim_conf.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
