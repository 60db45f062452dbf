"""Re-identification risk and utility metrics for quasi-identifier groups.

The measurement side of the reference's anonymization loop: after
k-anonymity / generalization decide HOW to transform
(`kgforge/anonymize/kpi.py`, reference KpiService semantics), these
metrics quantify the residual risk and the utility cost, per the
standard disclosure-risk models (prosecutor / journalist / marketer —
El Emam & Dankar 2008) and the discernibility cost metric (Bayardo &
Agrawal 2005).

- prosecutor risk (per record): 1/k of its QI group — the attacker knows
  the target is IN the data;
- journalist risk (global): 1/min(k) — the attacker matches against the
  whole release;
- marketer risk (global): n_groups/n — expected fraction re-identified
  by random matching;
- discernibility: Σ k² — every record costs the size of the group it is
  indistinguishable within (lower = more utility);
- avg group size, records-at-risk below a k threshold.

All of it is one map-side-combinable groupBy over the QI columns plus a
single global aggregate — no joins, no windows, nothing that changes
shape at 100 TB.  NULL QI values form their own group (groupBy treats
NULL as a key value), matching `suppress_small_groups`' null-safe
semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_risk(
    df: DataFrame, qi_cols: Sequence[str], k_threshold: int = 5
) -> DataFrame:
    """Per-QI-group equivalence classes: (qi..., k, prosecutor_risk,
    at_risk).  ``prosecutor_risk`` is rounded to 6 places (portable
    float convention)."""
    qi = list(qi_cols)
    return df.groupBy(*qi).agg(
        F.count(F.lit(1)).alias("k"),
        F.round(F.lit(1.0) / F.count(F.lit(1)), 6).alias("prosecutor_risk"),
        (F.count(F.lit(1)) < k_threshold).alias("at_risk"),
    )


def risk_summary(
    df: DataFrame, qi_cols: Sequence[str], k_threshold: int = 5
) -> DataFrame:
    """One row of global risk/utility metrics over the QI grouping:
    (n_records, n_groups, min_k, avg_group_size, journalist_risk,
    marketer_risk, discernibility, records_at_risk, pct_at_risk)."""
    g = group_risk(df, qi_cols, k_threshold)
    return g.agg(
        F.sum("k").alias("n_records"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("k").alias("min_k"),
        F.round(F.sum("k") / F.count(F.lit(1)), 6).alias("avg_group_size"),
        F.round(F.lit(1.0) / F.min("k"), 6).alias("journalist_risk"),
        F.round(F.count(F.lit(1)) / F.sum("k"), 6).alias("marketer_risk"),
        F.sum(F.col("k") * F.col("k")).alias("discernibility"),
        F.sum(F.when(F.col("at_risk"), F.col("k")).otherwise(F.lit(0))).alias(
            "records_at_risk"
        ),
        F.round(
            F.sum(F.when(F.col("at_risk"), F.col("k")).otherwise(F.lit(0)))
            / F.sum("k"),
            6,
        ).alias("pct_at_risk"),
    )
