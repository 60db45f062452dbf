"""Turtle serialization as DataFrame transforms (subject-grouped blocks).

The reference's Jena Models are most often eyeballed and diffed as Turtle
(Jena's default pretty format), so a triple-table → Turtle export belongs
next to the JSON-LD twin (kgforge/jsonld_out.py, the reference's wire
format: service/AnonymizationService.java:41-46) and the N-Triples scale
format (kgforge/ntriples.py).

Shape: ``to_turtle`` returns ONE row per subject — a multi-statement
``block`` string ``<s> p1 o1 ;\\n    p2 o2 .`` — plus one header row per
``@prefix`` directive.  Everything is whole-stage codegen; the only
shuffle is the per-subject groupBy, which at scale co-partitions with a
subject-bucketed triple table (zero extra exchange on the sink layout of
kgforge/kg/io.py).  Within a block, statements are sorted lexically so the
output is deterministic under any input partitioning.

``from_turtle`` parses the block-per-row dialect ``to_turtle`` emits (and
any single-subject Turtle statement group of that shape).  This is NOT a
general Turtle document parser — arbitrary Turtle is stateful across lines
(nested bnode property lists, mid-document @prefix) and therefore a poor
distributed interchange; use N-Triples for that.  The restricted dialect
is safe to split mechanically: escaped literals can never contain a raw
newline (ECHAR escaping), so the `` ;\\n    `` statement separator cannot
occur inside any term.

Prefix compaction (shared with the tests' and oracles' definition): an IRI
compacts under the LONGEST declared namespace it starts with, iff the
remaining local part matches ``^[A-Za-z_][A-Za-z0-9_-]*$`` (a conservative
subset of PN_LOCAL — anything fancier stays in ``<…>`` form, which is
always valid Turtle).  ``rdf:type`` in predicate position prints as ``a``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.ntriples import (
    _IRI_DTYPE,
    _dtype_iri_col,
    _escape_literal,
    _unescape_literal,
)
from kgforge.triples import RDF_TYPE

_LOCAL_RE = "^[A-Za-z_][A-Za-z0-9_-]*$"
_STMT_SEP = " ;\n    "


def _compact(c, prefixes: dict[str, str]):
    """IRI column → compact ``p:local`` when safe, else ``<iri>``.

    Longest namespace wins (e.g. ``ex2: http://ex.org/sub/`` beats
    ``ex: http://ex.org/``), mirroring Jena's prefix-map lookup.
    """
    expr = F.concat(F.lit("<"), c, F.lit(">"))
    # build the when-chain shortest-first so the longest namespace ends up
    # OUTERMOST (checked first) in the final expression
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substring(c, len(ns) + 1, 2**30)
        expr = F.when(
            c.startswith(ns) & local.rlike(_LOCAL_RE),
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(expr)
    return expr


def _subj_term(c, prefixes):
    return F.when(c.startswith("_:"), c).otherwise(_compact(c, prefixes))


def to_turtle(
    triples: DataFrame, prefixes: dict[str, str] | None = None, col: str = "block"
) -> DataFrame:
    """Serialize the canonical triple table to Turtle blocks.

    Returns one ``@prefix`` row per declared prefix plus one row per
    subject.  Statements within a block are sorted (deterministic output);
    blocks are independent rows, so a writer can emit them in any order —
    Turtle semantics don't depend on statement order.
    """
    prefixes = dict(prefixes or {})
    p = F.col("pred")
    pred_term = F.when(p == RDF_TYPE, F.lit("a")).otherwise(_compact(p, prefixes))
    dt = _dtype_iri_col(F.col("obj_dtype"))
    lit_body = F.concat(F.lit('"'), _escape_literal(F.col("obj_value")), F.lit('"'))
    obj_term = (
        F.when(F.col("obj_is_iri"), _subj_term(F.col("obj_value"), prefixes))
        .when(F.col("obj_dtype").startswith("@"), F.concat(lit_body, F.col("obj_dtype")))
        .when(dt.isNull(), lit_body)
        .otherwise(F.concat(lit_body, F.lit("^^"), _compact(dt, prefixes)))
    )
    blocks = (
        triples.select(
            F.col("subj"),
            F.concat_ws(" ", pred_term, obj_term).alias("_po"),
        )
        .groupBy("subj")
        .agg(F.sort_array(F.collect_list("_po")).alias("_pos"))
        .select(
            F.concat(
                _subj_term(F.col("subj"), prefixes),
                F.lit(" "),
                F.array_join("_pos", _STMT_SEP),
                F.lit(" ."),
            ).alias(col)
        )
    )
    if not prefixes:
        return blocks
    spark = triples.sparkSession
    header = spark.createDataFrame(
        [(f"@prefix {pfx}: <{ns}> .",) for pfx, ns in sorted(prefixes.items())],
        f"{col} string",
    )
    return header.unionByName(blocks)


# object-term classifier for the restricted dialect (same literal grammar
# as N-Triples, plus compact p:local and the bare `a` keyword handled at
# the predicate split)
_LITERAL_RE = (
    r'^"((?:[^"\\]|\\.)*)"'
    r"(?:\^\^(<[^<>\s]*>|[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z_][A-Za-z0-9_-]*)"
    r"|@([A-Za-z][A-Za-z0-9-]*))?$"
)
_BLOCK_RE = r"^\s*(<[^<>\s]*>|_:\S+|[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z_][A-Za-z0-9_-]*)\s+([\s\S]*?)\s*\.\s*$"
_PREFIX_LINE_RE = r"^@prefix\s+([A-Za-z_][A-Za-z0-9_-]*):\s+<([^<>\s]*)>\s+\.\s*$"


def from_turtle(blocks: DataFrame, col: str = "block") -> DataFrame:
    """Parse ``to_turtle``-dialect blocks back into the canonical triple
    table.  ``@prefix`` rows supply the expansion map (a driver collect
    bounded by the number of prefixes); comment/blank rows are ignored;
    anything else unparseable is dropped (same skip policy as the JSONL
    and N-Triples ingests).
    """
    c = F.col(col)
    header = blocks.filter(c.rlike(_PREFIX_LINE_RE)).select(
        F.regexp_extract(c, _PREFIX_LINE_RE, 1).alias("pfx"),
        F.regexp_extract(c, _PREFIX_LINE_RE, 2).alias("ns"),
    )
    prefixes = {r["pfx"]: r["ns"] for r in header.collect()}

    content = blocks.filter(
        (F.trim(c) != "") & ~F.trim(c).startswith("#") & ~c.rlike(_PREFIX_LINE_RE)
    )
    parsed = content.select(
        F.regexp_extract(c, _BLOCK_RE, 1).alias("_st"),
        F.regexp_extract(c, _BLOCK_RE, 2).alias("_body"),
    ).filter(F.col("_st") != "")
    po = parsed.select(
        F.col("_st"),
        F.explode(F.split("_body", _STMT_SEP, -1)).alias("_stmt"),
    ).select(
        F.col("_st").alias("_t"),
        F.regexp_extract("_stmt", r"^(\S+)\s+([\s\S]*)$", 1).alias("_pt"),
        F.regexp_extract("_stmt", r"^(\S+)\s+([\s\S]*)$", 2).alias("_o"),
    )

    subj = _expand_term(F.col("_t"), prefixes)
    po = po.withColumn("subj", subj)
    pred_term = F.col("_pt")
    pred = F.when(pred_term == "a", F.lit(RDF_TYPE)).otherwise(
        _expand_term(pred_term, prefixes)
    )

    o = F.col("_o")
    is_res = o.startswith("<") | o.startswith("_:") | o.rlike(
        r"^[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z_][A-Za-z0-9_-]*$"
    )
    obj_iri = _expand_term(o, prefixes)

    lex = F.regexp_extract(o, _LITERAL_RE, 1)
    dt_term = F.regexp_extract(o, _LITERAL_RE, 2)
    lang = F.regexp_extract(o, _LITERAL_RE, 3)
    lit_ok = o.rlike(_LITERAL_RE)
    dt_iri = F.when(dt_term == "", F.lit(None).cast("string")).otherwise(
        _expand_term(dt_term, prefixes)
    )

    from kgforge.ntriples import XSD_NS

    dtype_expr = F.lit("string")
    for iri, tag in _IRI_DTYPE.items():
        dtype_expr = F.when(dt_iri == iri, F.lit(tag)).otherwise(dtype_expr)
    dtype_expr = (
        F.when(dt_iri == XSD_NS + "string", F.lit("string"))
        .when(lang != "", F.concat(F.lit("@"), lang))
        .otherwise(dtype_expr)
    )
    dtype_expr = F.when(
        dt_iri.isNotNull() & dtype_expr.eqNullSafe(F.lit("string")) & (dt_iri != XSD_NS + "string"),
        dt_iri,
    ).otherwise(dtype_expr)

    rows = po.filter(is_res | lit_ok)
    return rows.select(
        F.col("subj"),
        pred.alias("pred"),
        F.when(is_res, obj_iri).otherwise(_unescape_literal(lex)).alias("obj_value"),
        F.when(is_res, F.lit("iri")).otherwise(dtype_expr).alias("obj_dtype"),
        is_res.alias("obj_is_iri"),
    )


def _expand_term(term, prefixes: dict[str, str]):
    """Term column → absolute IRI (strips ``<…>``, expands ``p:local``),
    bnodes pass through."""
    expr = F.when(
        term.startswith("<"),
        term.substr(F.lit(2), F.length(term) - F.lit(2)),
    )
    for pfx, ns in prefixes.items():
        expr = expr.when(
            term.startswith(pfx + ":"),
            F.concat(F.lit(ns), F.substring(term, len(pfx) + 2, 2**30)),
        )
    return expr.otherwise(term)
