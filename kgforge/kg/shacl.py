"""SHACL-core validation over the canonical triple table.

The reference's ecosystem describes data with SOyA/JSON-LD schemas and the
natural companion to an anonymization pipeline is shape validation of the
graph it emits (W3C SHACL, public spec).  A Jena user runs
``org.apache.jena.shacl.ShaclValidator`` per Model; at 100 TB the engine
must instead evaluate every shape with set-oriented scans, which is what
this module does.

Supported constraint components (the SHACL core set expressible without
recursive shapes): ``sh:minCount``, ``sh:maxCount``, ``sh:datatype``,
``sh:nodeKind`` (IRI / Literal), ``sh:pattern``, ``sh:class``,
``sh:minInclusive`` / ``sh:maxInclusive``, ``sh:in``.

Shapes are plain python dicts (the engine's equivalent of a shapes graph):

    {"shape": "CustomerShape",
     "target_class": "http://ex.org/Customer",
     "property": [
         {"path": "http://ex.org/name", "min_count": 1, "max_count": 1,
          "datatype": "string", "pattern": "^Customer#"},
         {"path": "http://ex.org/inNation", "node_kind": "IRI",
          "class": "http://ex.org/Nation"},
     ]}

Scale shape: each property constraint touches ONE predicate slice of the
triple table (a pushed-down filter on a pred-partitioned sink reads only
that predicate's files), joined to the target set.  Cardinality checks are
a single groupBy per (shape, path); value checks are stateless filters;
``sh:class`` is one distinct semi-join against the type slice.  Nothing is
per-shape iterated on the driver, and no constraint materializes a pair
set.  Violations come back as a validation-report DataFrame
(focus, shape, path, constraint, value) — the sh:ValidationResult fields a
Jena report would carry, minus the blank-node packaging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.inference import RDF_TYPE

REPORT_COLS = ("focus", "shape", "path", "constraint", "value")


def _report(df: DataFrame, shape: str, path: str, constraint: str, value_col):
    return df.select(
        F.col("focus"),
        F.lit(shape).alias("shape"),
        F.lit(path).alias("path"),
        F.lit(constraint).alias("constraint"),
        value_col.cast("string").alias("value"),
    )


def _empty_report(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "focus string, shape string, path string, constraint string, value string"
    )


def shacl_validate(triples: DataFrame, shapes: list[dict]) -> DataFrame:
    """Validate ``triples`` against ``shapes``; returns violation rows only
    (an empty result is a conformant graph).  Deterministic: one row per
    violating (focus, constraint, value) — cardinality violations carry the
    observed count as ``value``."""
    spark = triples.sparkSession
    reports = [_empty_report(spark)]

    type_slice = triples.filter(
        (F.col("pred") == RDF_TYPE) & F.col("obj_is_iri")
    ).select(F.col("subj").alias("_inst"), F.col("obj_value").alias("_cls"))

    for sh in shapes:
        shape = sh["shape"]
        targets = (
            type_slice.filter(F.col("_cls") == sh["target_class"])
            .select(F.col("_inst").alias("focus"))
            .distinct()
        )
        for prop in sh.get("property", ()):
            path = prop["path"]
            vals = triples.filter(F.col("pred") == path).select(
                F.col("subj").alias("focus"), "obj_value", "obj_dtype", "obj_is_iri"
            )
            tvals = vals.join(targets, "focus")

            mn, mx = prop.get("min_count"), prop.get("max_count")
            if mn is not None or mx is not None:
                counts = targets.join(
                    vals.groupBy("focus").agg(F.count(F.lit(1)).alias("_n")),
                    "focus",
                    "left",
                ).withColumn("_n", F.coalesce(F.col("_n"), F.lit(0)))
                if mn is not None:
                    reports.append(
                        _report(
                            counts.filter(F.col("_n") < mn),
                            shape, path, "minCount", F.col("_n"),
                        )
                    )
                if mx is not None:
                    reports.append(
                        _report(
                            counts.filter(F.col("_n") > mx),
                            shape, path, "maxCount", F.col("_n"),
                        )
                    )

            if "datatype" in prop:
                bad = tvals.filter(
                    F.col("obj_is_iri")
                    | ~F.col("obj_dtype").eqNullSafe(F.lit(prop["datatype"]))
                )
                reports.append(
                    _report(bad, shape, path, "datatype", F.col("obj_value"))
                )

            if "node_kind" in prop:
                want_iri = prop["node_kind"] == "IRI"
                bad = tvals.filter(F.col("obj_is_iri") != F.lit(want_iri))
                reports.append(
                    _report(bad, shape, path, "nodeKind", F.col("obj_value"))
                )

            if "pattern" in prop:
                bad = tvals.filter(
                    ~F.col("obj_is_iri") & ~F.col("obj_value").rlike(prop["pattern"])
                )
                reports.append(
                    _report(bad, shape, path, "pattern", F.col("obj_value"))
                )

            if "class" in prop:
                cls_members = type_slice.filter(
                    F.col("_cls") == prop["class"]
                ).select(F.col("_inst").alias("obj_value")).distinct()
                bad = tvals.filter(F.col("obj_is_iri")).join(
                    cls_members, "obj_value", "left_anti"
                ).unionByName(
                    # a literal can never be an instance of sh:class
                    tvals.filter(~F.col("obj_is_iri"))
                )
                reports.append(
                    _report(bad, shape, path, "class", F.col("obj_value"))
                )

            lo, hi = prop.get("min_inclusive"), prop.get("max_inclusive")
            if lo is not None or hi is not None:
                num = tvals.withColumn("_x", F.col("obj_value").try_cast("double"))
                rng = F.lit(False)
                if lo is not None:
                    rng = rng | (F.col("_x") < lo)
                if hi is not None:
                    rng = rng | (F.col("_x") > hi)
                bad = num.filter(F.col("_x").isNull() | rng)
                name = "minInclusive" if lo is not None else "maxInclusive"
                reports.append(
                    _report(bad, shape, path, name, F.col("obj_value"))
                )

            if "in" in prop:
                bad = tvals.filter(~F.col("obj_value").isin(list(prop["in"])))
                reports.append(
                    _report(bad, shape, path, "in", F.col("obj_value"))
                )

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.distinct()
