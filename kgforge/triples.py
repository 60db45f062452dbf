"""Canonical triple DataFrame model.

The reference keeps all state in a Jena ``Model`` — a mutable bag of
(subject, predicate, object) triples (reference:
service/AnonymizationService.java:139-149).  Our universal interchange is a
DataFrame with this schema, partitionable by ``pred`` for predicate-scoped
scans at scale (Iceberg/parquet partition column):

    subj        string   -- IRI or blank-node id ("_:bN")
    pred        string   -- IRI
    obj_value   string   -- lexical form (IRI string when obj_is_iri)
    obj_dtype   string   -- "string" | "xsd:integer" | "xsd:long" |
                            "xsd:double" | "xsd:date" | "xsd:dateTime" |
                            "xsd:boolean" | "iri"
    obj_is_iri  boolean
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
RDFS_COMMENT = "http://www.w3.org/2000/01/rdf-schema#comment"
# the reference mints min/max in the rdf-schema namespace (Generalization.java:16-17)
RDF_MIN = "http://www.w3.org/2000/01/rdf-schema#min"
RDF_MAX = "http://www.w3.org/2000/01/rdf-schema#max"
SOYA_URL = "http://ns.ownyourdata.eu/ns/soya-context/"

XSD = "http://www.w3.org/2001/XMLSchema#"

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_value", T.StringType(), True),
        T.StructField("obj_dtype", T.StringType(), True),
        T.StructField("obj_is_iri", T.BooleanType(), False),
    ]
)


def triples_df(spark: SparkSession, rows) -> DataFrame:
    """Build a triple DataFrame from (subj, pred, obj_value, obj_dtype, obj_is_iri) tuples."""
    return spark.createDataFrame(list(rows), schema=TRIPLE_SCHEMA)


def empty_triples(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], schema=TRIPLE_SCHEMA)


def local_name(iri: str) -> str:
    """Last '/'- or '#'-segment (reference: ConfigurationService.java:151-154)."""
    i = max(iri.rfind("/"), iri.rfind("#"))
    return iri[i + 1 :] if i != -1 else iri


LOCAL_NAME_SQL = F.substring_index  # used as substring_index(substring_index(c,'#',-1),'/',-1)


def local_name_col(c):
    return F.substring_index(F.substring_index(c, "#", -1), "/", -1)


def subjects_of_type(triples: DataFrame, type_iri: str) -> DataFrame:
    """Distinct subjects with rdf:type <type_iri> — the emergent 'table'."""
    return (
        triples.filter((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == type_iri))
        .select("subj")
        .distinct()
    )


def attr_column(triples: DataFrame, subjects: DataFrame, attr_iri: str) -> DataFrame:
    """One attribute's column vector: (subj, obj_value, obj_dtype, obj_is_iri).

    Equivalent of one OPTIONAL arm of the reference's pivot query
    (data/QueryBuildingService.java:31-46) restricted to present values —
    the reference's per-attribute maps only hold non-null entries
    (service/AnonymizationService.java:118-126).  The pred equality filter
    prunes to a single predicate partition at scale.
    """
    return (
        triples.filter(F.col("pred") == attr_iri)
        .join(subjects, "subj", "left_semi")
        .select("subj", "obj_value", "obj_dtype", "obj_is_iri")
    )
