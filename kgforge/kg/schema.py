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
