"""R2RML-lite: map relational DataFrames onto the canonical triple model.

The W3C R2RML recommendation (RDB to RDF Mapping Language, 2012) is the
standard way a warehouse table becomes a knowledge graph: a *triples
map* gives each row a subject IRI from a string template over its
columns, an optional ``rdf:type``, and one (predicate, object) per
*predicate-object map* — objects being column literals, template IRIs,
or constants; foreign keys become entity links by templating the FK
column into the referenced table's subject template (the common
``rr:template``-based join shortcut).

This module implements that core over Spark, one table scan per triples
map and ZERO shuffles: every template compiles to a ``concat`` of
literals and column casts, all predicate-object maps are built as an
array of structs in a single projection and exploded once (the
kg/relations.py trick), and R2RML's NULL rule (a map produces no triple
when any referenced column is NULL) falls out of ``concat``'s
null-propagation plus one filter.  Output rows use the repo's canonical
schema (subj, pred, obj_value, obj_dtype, obj_is_iri) so the result
unions straight into every downstream kg operator.

Scale: map-only — partitioning, pushdown, and pruning are whatever the
source scan already has; at 100 TB the triple materialization adds no
exchange of its own.  Cite: reference ingest melts flat JSON the same
way (``kgforge/ingest.py``); this is the relational twin.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.triples import RDF_TYPE

_PLACEHOLDER = re.compile(r"\{([A-Za-z0-9_]+)\}")


@dataclass(frozen=True)
class ObjectMap:
    """One predicate-object map.  Exactly one of ``column`` (literal),
    ``template`` (IRI built from columns), or ``constant`` (fixed IRI)."""

    predicate: str
    column: str | None = None
    template: str | None = None
    constant: str | None = None
    datatype: str = "string"  # obj_dtype for column literals

    def __post_init__(self):
        if sum(x is not None for x in (self.column, self.template,
                                       self.constant)) != 1:
            raise ValueError(
                f"ObjectMap({self.predicate!r}): exactly one of "
                "column/template/constant required"
            )


@dataclass(frozen=True)
class TriplesMap:
    subject_template: str
    rdf_class: str | None = None
    object_maps: tuple[ObjectMap, ...] = field(default_factory=tuple)


def _template_col(template: str) -> F.Column:
    """'http://ex/c/{c_custkey}' → concat('http://ex/c/', cast(col)).
    NULL in any referenced column nulls the whole concat (the R2RML
    no-triple rule)."""
    parts: list[F.Column] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        parts.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        raise ValueError("empty template")
    return F.concat(*parts)


def r2rml_triples(df: DataFrame, tm: TriplesMap) -> DataFrame:
    """Apply one triples map to one table — one scan, one explode, no
    shuffle.  Rows whose subject template hits a NULL produce nothing;
    an object map hitting a NULL drops just that triple."""
    subj = _template_col(tm.subject_template).alias("subj")
    structs = []
    if tm.rdf_class is not None:
        structs.append(F.struct(
            F.lit(RDF_TYPE).alias("pred"),
            F.lit(tm.rdf_class).alias("obj_value"),
            F.lit("iri").alias("obj_dtype"),
            F.lit(True).alias("obj_is_iri"),
        ))
    for om in tm.object_maps:
        if om.column is not None:
            obj = F.col(om.column).cast("string")
            dtype, is_iri = om.datatype, False
        elif om.template is not None:
            obj = _template_col(om.template)
            dtype, is_iri = "iri", True
        else:
            obj = F.lit(om.constant)
            dtype, is_iri = "iri", True
        structs.append(F.struct(
            F.lit(om.predicate).alias("pred"),
            obj.alias("obj_value"),
            F.lit(dtype).alias("obj_dtype"),
            F.lit(is_iri).alias("obj_is_iri"),
        ))
    out = (
        df.select(subj, F.explode(F.array(*structs)).alias("m"))
        .filter(F.col("subj").isNotNull() & F.col("m.obj_value").isNotNull())
        .select(
            "subj",
            F.col("m.pred").alias("pred"),
            F.col("m.obj_value").alias("obj_value"),
            F.col("m.obj_dtype").alias("obj_dtype"),
            F.col("m.obj_is_iri").alias("obj_is_iri"),
        )
    )
    return out


def r2rml_graph(maps: list[tuple[DataFrame, TriplesMap]]) -> DataFrame:
    """Union the triples of several (table, map) pairs into one graph."""
    if not maps:
        raise ValueError("no triples maps")
    dfs = [r2rml_triples(df, tm) for df, tm in maps]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
