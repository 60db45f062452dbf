"""N-Triples serialization / parsing as pure-JVM DataFrame transforms.

The reference exchanges graphs only as JSON-LD (Jena ``RDFDataMgr`` with
``Lang.JSONLD``, reference: service/ConfigurationService.java:63 and
AnonymizationService.java:41-46), but any Jena user can ask the same Model
for N-Triples — and at 100 TB N-Triples is the format you actually want:
one triple per line, no document-level state, so both directions are
embarrassingly parallel and a parquet→N-Triples export or an N-Triples→
triple-table import is a single narrow map with no shuffle at all.

Both directions are whole-stage-codegen string expressions over the
canonical triple schema (``kgforge.triples.TRIPLE_SCHEMA``):

- ``to_ntriples``   — triples → one ``line`` per triple (RDF 1.1 N-Triples,
  UTF-8 body; only ``\\ " \\n \\r \\t`` are escaped, the spec's required set).
- ``from_ntriples`` — lines → triples, with the same corrupt-input policy
  surface as the JSONL ingest (``mode="skip"`` drops bad lines,
  ``mode="strict"`` raises with a count).

Escape/unescape use ``F.replace`` (literal, not regex) chains.  Unescaping
uses the standard sentinel trick — rewrite ``\\\\`` pairs to a sentinel char
first, then the single-char escapes, then the sentinel back to ``\\`` — which
is exactly equivalent to a left-to-right escape scan because literal
``replace`` consumes matches left-to-right without overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

XSD_NS = "http://www.w3.org/2001/XMLSchema#"

# internal dtype tag → full datatype IRI (same table the JSON-LD serializer
# uses; the reference's java:LocalDate quirk is a JSON-LD *response-surface*
# behavior of rdfs:min/max bounds, not part of the canonical model, so it is
# deliberately absent here).
_DTYPE_IRI = {
    "xsd:double": XSD_NS + "double",
    "xsd:float": XSD_NS + "float",
    "xsd:integer": XSD_NS + "integer",
    "xsd:long": XSD_NS + "long",
    "xsd:int": XSD_NS + "int",
    "xsd:date": XSD_NS + "date",
    "xsd:dateTime": XSD_NS + "dateTime",
    "xsd:boolean": XSD_NS + "boolean",
}
_IRI_DTYPE = {v: k for k, v in _DTYPE_IRI.items()}

_SENTINEL = "\x00"


def _escape_literal(c):
    """RDF 1.1 N-Triples ECHAR escaping of a literal's lexical form."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def _unescape_literal(c):
    c = F.replace(c, F.lit("\\\\"), F.lit(_SENTINEL))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    c = F.replace(c, F.lit(_SENTINEL), F.lit("\\"))
    return c


def _term(c):
    """Subject/object resource term: blank nodes pass through, IRIs wrap."""
    return F.when(c.startswith("_:"), c).otherwise(F.concat(F.lit("<"), c, F.lit(">")))


def _dtype_iri_col(dtype):
    """Internal dtype tag → datatype IRI, as a column expression."""
    expr = F.lit(None).cast("string")
    for tag, iri in _DTYPE_IRI.items():
        expr = F.when(dtype == tag, F.lit(iri)).otherwise(expr)
    # unknown non-string tags: already-absolute IRIs pass through, anything
    # else is preserved round-trippably under the tag itself (Jena does the
    # same for unregistered datatypes — the IRI is just carried).
    expr = F.when(
        dtype.isNotNull()
        & (dtype != "string")
        & (dtype != "iri")
        & ~dtype.startswith("@")
        & expr.isNull(),
        dtype,
    ).otherwise(expr)
    return expr


def to_ntriples(triples: DataFrame, col: str = "line") -> DataFrame:
    """Serialize the canonical triple table to N-Triples lines.

    One output row per triple; no shuffle, no Python — the whole thing is
    one codegen'd projection, so an export writes straight from the
    triple table's existing partitioning.
    """
    s = _term(F.col("subj"))
    p = F.concat(F.lit("<"), F.col("pred"), F.lit(">"))
    dt = _dtype_iri_col(F.col("obj_dtype"))
    lit_body = F.concat(F.lit('"'), _escape_literal(F.col("obj_value")), F.lit('"'))
    o = (
        F.when(F.col("obj_is_iri"), _term(F.col("obj_value")))
        .when(  # language-tagged literal ("@en" in obj_dtype) → "..."@en
            F.col("obj_dtype").startswith("@"),
            F.concat(lit_body, F.col("obj_dtype")),
        )
        .when(dt.isNull(), lit_body)
        .otherwise(F.concat(lit_body, F.lit("^^<"), dt, F.lit(">")))
    )
    return triples.select(F.concat_ws(" ", s, p, o, F.lit(".")).alias(col))


# one regex splits a line into (subject-term, predicate-IRI, object-term);
# the object term is then classified without re-scanning the line.
_LINE_RE = r"^\s*(<[^<>\s]*>|_:\S+)\s+<([^<>\s]*)>\s+(.*?)\s*\.\s*$"
_LITERAL_RE = r'^"((?:[^"\\]|\\.)*)"(?:\^\^<([^<>\s]*)>|@([A-Za-z][A-Za-z0-9-]*))?$'


def from_ntriples(
    lines: DataFrame, col: str = "line", mode: str = "skip"
) -> DataFrame:
    """Parse N-Triples lines into the canonical triple table.

    Blank lines and ``#`` comment lines are ignored per spec.  Anything
    else that does not parse is dropped (``mode="skip"``) or raises with a
    count (``mode="strict"``) — the same policy surface as the distributed
    JSONL ingest (kgforge/ingest.py).  Language-tagged literals keep their
    tag in ``obj_dtype`` as ``@<tag>`` (the canonical model has no lang
    column); ``to_ntriples`` recognises the ``@`` prefix and re-emits
    ``"..."@tag`` syntax, so tagged literals round-trip exactly.
    """
    if mode not in ("skip", "strict"):
        raise ValueError(f"mode must be 'skip' or 'strict', got {mode!r}")
    c = F.col(col)
    content = lines.filter(
        (F.trim(c) != "") & ~F.trim(c).startswith("#")
    )
    parsed = content.select(
        F.regexp_extract(c, _LINE_RE, 1).alias("_s"),
        F.regexp_extract(c, _LINE_RE, 2).alias("_p"),
        F.regexp_extract(c, _LINE_RE, 3).alias("_o"),
    )
    if mode == "strict":
        parsed = parsed.persist()
        bad_shape = parsed.filter(F.col("_s") == "").count()
        if bad_shape:
            parsed.unpersist()
            raise ValueError(f"{bad_shape} unparseable N-Triples line(s)")
    ok = parsed.filter(F.col("_s") != "")

    subj = F.when(
        F.col("_s").startswith("<"),
        F.expr("substring(_s, 2, length(_s) - 2)"),
    ).otherwise(F.col("_s"))

    o = F.col("_o")
    is_iri_obj = o.startswith("<") | o.startswith("_:")
    obj_iri = F.when(
        o.startswith("<"), F.expr("substring(_o, 2, length(_o) - 2)")
    ).otherwise(o)

    lex = F.regexp_extract(o, _LITERAL_RE, 1)
    dt_iri = F.regexp_extract(o, _LITERAL_RE, 2)
    lang = F.regexp_extract(o, _LITERAL_RE, 3)
    # a literal line that fails the literal regex entirely is malformed:
    # regexp_extract returns "" for group 1 AND the term doesn't start with
    # a quote-matched form — detect by re-testing the full pattern.
    lit_ok = o.rlike(_LITERAL_RE)

    dtype_expr = F.lit("string")
    for iri, tag in _IRI_DTYPE.items():
        dtype_expr = F.when(dt_iri == iri, F.lit(tag)).otherwise(dtype_expr)
    dtype_expr = (
        F.when(dt_iri == XSD_NS + "string", F.lit("string"))
        .when(lang != "", F.concat(F.lit("@"), lang))
        .otherwise(dtype_expr)
    )
    dtype_expr = F.when(
        (dt_iri != "") & dtype_expr.eqNullSafe(F.lit("string")) & (dt_iri != XSD_NS + "string"),
        dt_iri,
    ).otherwise(dtype_expr)

    rows = ok.filter(is_iri_obj | lit_ok)
    if mode == "strict":
        bad_obj = parsed.filter(
            (F.col("_s") != "") & ~(is_iri_obj | lit_ok)
        ).count()
        parsed.unpersist()
        if bad_obj:
            raise ValueError(f"{bad_obj} malformed object term(s)")

    return rows.select(
        subj.alias("subj"),
        F.col("_p").alias("pred"),
        F.when(is_iri_obj, obj_iri).otherwise(_unescape_literal(lex)).alias("obj_value"),
        F.when(is_iri_obj, F.lit("iri")).otherwise(dtype_expr).alias("obj_dtype"),
        is_iri_obj.alias("obj_is_iri"),
    )
