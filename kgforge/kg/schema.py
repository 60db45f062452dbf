"""RDFS schema induction: per-predicate domain/range discovery.

The reverse of ``kg/inference.py``'s rdfs:domain/range ENTAILMENT
(reference semantics: declared schema implies types): here the schema is
INDUCED from the instance data — for every non-``rdf:type`` predicate,
which subject class and which object class/datatype dominate, and with
what support.  This is the first schema-discovery query run against a
freshly-constructed KG (what VoID's property partitions don't tell you),
and the input to auto-generated SHACL shapes.

Scale shape: one filter splits type assertions from data triples; the
class lookups are plain equi-joins on subject / object IRI (AQE decides
broadcast vs shuffle — at 10^12 triples the type table is itself huge,
so no forced broadcast); the winner per predicate is a row_number window
PARTITIONED BY predicate — bounded by the (small) predicate × class
cross-section, never by the triple count.  Supports are exact int64
ratios.  Multi-typed subjects credit each of their classes, so support
can exceed 1 for predicates whose subjects carry several types (reported,
not hidden — it is real signal about the class lattice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def induce_domain_range(
    triples: DataFrame, rdf_type: str = RDF_TYPE, untyped: str = "untyped"
) -> DataFrame:
    """(pred, n_triples, domain_class, domain_support, range_class,
    range_support): the modal subject class and modal object class (or
    literal datatype, prefixed ``literal:``) per predicate.

    Ties break by class name ascending; nodes with no ``rdf:type`` count
    under ``untyped``.  Expects the canonical triple schema
    (subj, pred, obj_value, obj_dtype, obj_is_iri)."""
    types = triples.filter(F.col("pred") == rdf_type).select(
        F.col("subj").alias("_node"), F.col("obj_value").alias("_cls")
    )
    data = triples.filter(F.col("pred") != rdf_type)

    totals = data.groupBy("pred").agg(F.count(F.lit(1)).alias("n_triples"))

    def winner(counted: DataFrame, cls_col: str, sup_col: str) -> DataFrame:
        w = Window.partitionBy("pred").orderBy(
            F.col("_n").desc(), F.col("_cls").asc()
        )
        return (
            counted.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "pred",
                F.col("_cls").alias(cls_col),
                F.col("_n").alias(sup_col + "_n"),
            )
        )

    dom = winner(
        data.join(types, data["subj"] == types["_node"], "left")
        .select("pred", F.coalesce("_cls", F.lit(untyped)).alias("_cls"))
        .groupBy("pred", "_cls")
        .agg(F.count(F.lit(1)).alias("_n")),
        "domain_class",
        "domain",
    )
    obj_cls = F.when(
        ~F.col("obj_is_iri"),
        F.concat(F.lit("literal:"), F.coalesce("obj_dtype", F.lit("plain"))),
    ).otherwise(F.coalesce("_cls", F.lit(untyped)))
    rng = winner(
        data.join(types, data["obj_value"] == types["_node"], "left")
        .select("pred", obj_cls.alias("_cls"))
        .groupBy("pred", "_cls")
        .agg(F.count(F.lit(1)).alias("_n")),
        "range_class",
        "range",
    )
    return (
        totals.join(dom, "pred")
        .join(rng, "pred")
        .select(
            "pred",
            "n_triples",
            "domain_class",
            F.round(F.col("domain_n") / F.col("n_triples"), 6).alias(
                "domain_support"
            ),
            "range_class",
            F.round(F.col("range_n") / F.col("n_triples"), 6).alias(
                "range_support"
            ),
        )
    )


def induce_subsumption(
    assertions: DataFrame,
    node_col: str = "node",
    cls_col: str = "cls",
    min_support: int = 2,
    min_conf: float = 0.9,
) -> DataFrame:
    """Class-subsumption induction by extension containment: report
    ``sub ⊑ sup`` whenever (nearly) every node asserted in ``sub`` is also
    asserted in ``sup`` —

        confidence = |ext(sub) ∩ ext(sup)| / |ext(sub)|  ≥ min_conf

    with ``|ext(sub)| ≥ min_support`` to mute one-off classes.  This is
    the instance-driven half of schema discovery (rdfs:subClassOf mining
    — Völker & Niepert's statistical schema induction), and it applies
    unchanged to "∃P" property-presence pseudo-classes, where it mines
    property implications ("everything with birthDate has a name").

    Output: ``(sub, sup, n_sub, n_both, confidence, is_exact)``.

    Scale: one distinct, one per-node self-join (cost Σ k_node² over each
    node's OWN class count — bounded by the class lattice's width, never
    |nodes|²), two map-side-combinable groupBys.  Skew lives on nodes
    with many classes; the k² term is the honest price of pair mining and
    the reason min_support filtering happens after one aggregation, not
    via a second scan."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    a = assertions.select(
        F.col(node_col).alias("n"), F.col(cls_col).alias("c")
    ).distinct()
    sizes = a.groupBy(F.col("c").alias("sub")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sub")
    )
    both = (
        a.join(a.withColumnRenamed("c", "c2"), "n")
        .filter(F.col("c") != F.col("c2"))
        .groupBy(F.col("c").alias("sub"), F.col("c2").alias("sup"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    conf = F.col("n_both").cast("double") / F.col("n_sub")
    return (
        both.join(sizes, "sub")
        .filter(
            (F.col("n_sub") >= min_support)
            & (conf >= F.lit(min_conf))
        )
        .select(
            "sub",
            "sup",
            "n_sub",
            "n_both",
            F.round(conf, 6).alias("confidence"),
            (F.col("n_both") == F.col("n_sub")).alias("is_exact"),
        )
    )


def predicate_cardinality(
    triples: DataFrame, rdf_type: str = RDF_TYPE
) -> DataFrame:
    """Per-predicate cardinality profile over the data (non-``rdf:type``)
    triples: functional / inverse-functional detection plus the fan-out
    statistics a query planner and a sameAs-smushing pass both need —
    ``owl:FunctionalProperty`` candidates are exactly the preds with
    ``max_per_subj == 1``, inverse-functional (the join keys that justify
    entity merging) those with ``max_per_obj == 1``.

    Output: ``(pred, n_triples, n_subj, n_obj, max_per_subj, max_per_obj,
    avg_per_subj, is_functional, is_inverse_functional)``.

    Scale: two grouped counts ((pred, subj) and (pred, obj)) re-aggregated
    to per-pred rows — map-side combinable end to end, output bounded by
    the predicate vocabulary."""
    data = triples.filter(F.col("pred") != rdf_type)
    per_subj = data.groupBy("pred", "subj").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    subj_stats = per_subj.groupBy("pred").agg(
        F.sum("_c").cast("bigint").alias("n_triples"),
        F.count(F.lit(1)).cast("bigint").alias("n_subj"),
        F.max("_c").alias("max_per_subj"),
    )
    per_obj = data.groupBy("pred", "obj_value").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    obj_stats = per_obj.groupBy("pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obj"),
        F.max("_c").alias("max_per_obj"),
    )
    return subj_stats.join(obj_stats, "pred").select(
        "pred",
        "n_triples",
        "n_subj",
        "n_obj",
        "max_per_subj",
        "max_per_obj",
        F.round(
            F.col("n_triples").cast("double") / F.col("n_subj"), 6
        ).alias("avg_per_subj"),
        (F.col("max_per_subj") == 1).alias("is_functional"),
        (F.col("max_per_obj") == 1).alias("is_inverse_functional"),
    )
