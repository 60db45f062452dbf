"""Anonymization pipeline orchestrator.

Spark re-expression of AnonymizationService.applyAnonymizationForObject
(reference: service/AnonymizationService.java:74-116): per configured object
type — used-property semi-join (J1), per-attribute column extraction (J2
decomposed; pred-pruned scans), operator dispatch (Configuration.java:29-65),
KPI write-back, original deletion (QueryBuildingService.java:98-123), optional
rename-to-original (AnonymizationService.java:159-201).

The config is driver-side (tiny, broadcast into every generated plan); all
data movement is DataFrame transforms.  Per-type results accumulate into the
same triple table, exactly like the reference's shared Jena model (M5).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.anonymize import kpi as kpi_mod
from kgforge.anonymize import ops
from kgforge.anonymize.buckets import calculate_number_of_buckets
from kgforge.config import AnonymizationConfig, AttrConfig, DEMO_PREFIX
from kgforge.rank import release_rank_caches
from kgforge.triples import attr_column, subjects_of_type, triples_df

_SUFFIX = {
    "masking": "_masked",
    "generalization": "_generalized",
    "randomization": "_randomized",
}


@dataclass
class AnonymizationReport:
    """Bookkeeping for assertions / KPIs (also present as triples)."""

    k_anonymity: dict[str, int] = field(default_factory=dict)  # type -> k
    nr_buckets: dict[str, dict[str, int]] = field(default_factory=dict)
    used: dict[str, list[str]] = field(default_factory=dict)


def anonymize_triples(
    triples: DataFrame,
    config: AnonymizationConfig,
    *,
    calculate_kpi: bool = True,
    include_original_data: bool = False,
    use_adjusted_attributes: bool = True,
    random_seed: int | None = None,
    hier_prefix: str = DEMO_PREFIX,
    order_pred: str | None = None,
    rng_mode: str = "exact",
) -> tuple[DataFrame, AnonymizationReport]:
    """Apply the full anonymization pipeline; returns (new triples, report).

    ``order_pred`` names a predicate whose integer value fixes sort tie order
    (the flat codec's injected counter).  The reference's tie order is
    unspecified (HashMap iteration, Randomization.java:61-66); we make it
    deterministic — value multisets are tie-order-invariant so KPIs and bucket
    contents match the reference exactly, only tied rows may swap resources.
    """
    spark = triples.sparkSession
    seed = int(time.time() * 1000) if random_seed is None else random_seed
    report = AnonymizationReport()

    order_df = None
    if order_pred is not None:
        order_df = (
            triples.filter(F.col("pred") == order_pred)
            .select("subj", F.col("obj_value").cast("long").alias("_tie"))
            .dropDuplicates(["subj"])
        )

    for type_iri, attrs_cfg in config.items():
        subjects = subjects_of_type(triples, type_iri)

        # J1: which configured predicates are actually used by this type
        counts_rows = (
            triples.join(subjects, "subj", "left_semi")
            .filter(F.col("pred").isin(list(attrs_cfg)))
            .groupBy("pred")
            .count()
            .collect()
        )
        counts = {r["pred"]: r["count"] for r in counts_rows}
        used = [a for a in attrs_cfg if a in counts]
        report.used[type_iri] = used
        n_anon = sum(
            1
            for a in used
            if attrs_cfg[a].strategy in ("generalization", "randomization")
        )

        new_parts: list[DataFrame] = []
        kpi_rows: list[tuple] = []
        report.nr_buckets[type_iri] = {}

        for attr in used:
            cfg: AttrConfig = attrs_cfg[attr]
            n = counts[attr]
            col_df = attr_column(triples, subjects, attr)
            if order_df is not None:
                col_df = col_df.join(order_df, "subj", "left")
            else:
                col_df = col_df.withColumn("_tie", F.col("subj"))
            order_col = F.col("_tie")

            if cfg.strategy == "masking":
                new_parts.append(ops.mask(col_df, attr))
                continue  # masking records no KPI attribute info (short ctor)

            g = calculate_number_of_buckets(n, n_anon)
            report.nr_buckets[type_iri][attr] = g
            if calculate_kpi:
                kpi_rows.extend(
                    kpi_mod.attribute_info_rows(type_iri, attr, cfg.strategy, g)
                )

            if cfg.strategy == "generalization":
                if cfg.is_object_generalization:
                    new_parts.append(
                        ops.generalize_object(
                            triples, col_df, attr, cfg.attr_order, g, n, hier_prefix
                        )
                    )
                else:
                    new_parts.append(
                        ops.generalize(col_df, attr, cfg.datatype, g, n, order_col)
                    )
            elif cfg.strategy == "randomization":
                new_parts.append(
                    ops.randomize(
                        col_df, attr, cfg.datatype, g, n, seed, order_col, rng_mode
                    )
                )
            else:
                raise ValueError(f"No Anonymization implementation for {cfg.strategy}")

        for part in new_parts:
            triples = triples.unionByName(
                part.select("subj", "pred", "obj_value", "obj_dtype", "obj_is_iri")
            )
        if kpi_rows:
            triples = triples.unionByName(triples_df(spark, kpi_rows))
        # Lineage truncation, not just caching: each attribute operator stacks
        # a rank/bucket/noise subtree onto the shared triple table, and the KPI
        # pass re-joins that table against itself several times.  Without a
        # checkpoint the analyzed plan grows multiplicatively per type —
        # analysis time dominates tiny inputs and the driver can OOM just
        # rendering plan strings for the SQL listener.  The written-back model
        # is reused by KPIs, deletes, renames, and serialization, so this is
        # the natural stage boundary to checkpoint.  When the session has a
        # checkpoint dir configured we take a RELIABLE checkpoint (survives
        # executor loss / dynamic allocation on a real cluster); otherwise
        # localCheckpoint (unreplicated executor blocks — fine for local mode
        # and fixture-sized services, not for long cluster jobs).
        triples = _truncate(triples, eager=True)
        # the checkpoint materialized every operator plan for this type, so
        # the rank caches the operators pinned (range-partitioned sort
        # frames) are now redundant — release them before the next type
        release_rank_caches()

        if calculate_kpi:
            k = kpi_mod.k_anonymity(triples, type_iri, used, attrs_cfg)
            report.k_anonymity[type_iri] = k
            triples = triples.unionByName(
                triples_df(spark, kpi_mod.kpi_object_rows(type_iri, k))
            )

        if not include_original_data and used:
            subjects = subjects_of_type(triples, type_iri)
            vict = (
                triples.join(subjects, "subj", "left_semi")
                .filter(F.col("pred").isin(used))
            )
            children = vict.filter(F.col("obj_is_iri")).select(
                F.col("obj_value").alias("subj")
            ).distinct()
            typed = subjects.withColumnRenamed("subj", "_ts")
            triples = (
                triples.join(typed, triples["subj"] == typed["_ts"], "left")
                .filter(F.col("_ts").isNull() | ~F.col("pred").isin(used))
                .drop("_ts")
            )
            # one-hop delete of the value's own triples (drops address
            # sub-objects — QueryBuildingService.java:98-123)
            triples = triples.join(children, "subj", "left_anti")

        if not use_adjusted_attributes:
            # copy <attr>_<suffix> onto <attr>, drop both old predicate sets —
            # global rewrites, like listStatements(null, p, null)
            for attr in used:
                sfx = attr + _SUFFIX[attrs_cfg[attr].strategy]
                moved = triples.filter(F.col("pred") == sfx).withColumn(
                    "pred", F.lit(attr)
                )
                triples = triples.filter(
                    (F.col("pred") != attr) & (F.col("pred") != sfx)
                ).unionByName(moved)

        # Truncate again after deletes/renames so the next type's loop (and the
        # caller's serialization) starts from a flat plan.  eager=False: the
        # plan is already replaced by a LogicalRDD; materialization happens on
        # the caller's first action.
        triples = _truncate(triples, eager=False)

    return triples, report


def _truncate(df: DataFrame, eager: bool) -> DataFrame:
    """Plan-lineage truncation point: reliable ``checkpoint`` when the session
    has a checkpoint dir (cluster-safe — replicated, survives executor loss),
    ``localCheckpoint`` otherwise (local mode / short-lived fixture jobs)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
