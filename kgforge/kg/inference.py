"""RDFS forward-chaining materialization over the canonical triple table.

The reference manipulates graphs through Jena ``Model``s (reference:
service/AnonymizationService.java:41-46, service/SparqlService.java), and a
Jena user gets RDFS entailment by wrapping the same Model in an
``InfModel``/``RDFSRuleReasoner``.  This module re-expresses that surface the
way a 100-TB engine has to: **materialize** the entailed triples once with
set-oriented DataFrame algebra instead of answering entailment queries
through a rule engine per lookup.

Supported fragment — the ρdf core (Muñoz, Pérez, Gutierrez, *Minimal
deductive systems for RDF*, public) over the four RDFS schema predicates:

- rdfs5  : subPropertyOf transitivity
- rdfs11 : subClassOf transitivity
- rdfs7  : (s p o) ∧ (p ⊑p q)      → (s q o)
- rdfs2  : (s p o) ∧ domain(p, C)  → (s rdf:type C)
- rdfs3  : (s p o) ∧ range(p, C)   → (o rdf:type C)   [o a resource]
- rdfs9  : (s rdf:type C) ∧ (C ⊑c D) → (s rdf:type D)

Scale shape — the whole point of the design: the schema (TBox) is orders of
magnitude smaller than the instance data (ABox), so the only iteration runs
on the TBox (semi-naive transitive closure, the same loop shape as
``kgforge/kg/components.py`` and ``kgforge/sparql.py:_path_rel``), and the
ABox is touched by exactly THREE broadcast hash joins + one union/distinct —
no fixpoint over the 100-TB table, no shuffle of the big side beyond the
final dedup.  Rule order (sp-closure → rdfs7 → rdfs2/3 → sc-closure → rdfs9)
reaches the fragment's fixpoint in one pass: every type-producing rule runs
before rdfs9, and rdfs2/3 run over asserted ∪ rdfs7-derived property facts.

Out of scope (documented, per the ρdf restriction): meta-level entailments
where a USER property is declared ``rdfs:subPropertyOf`` one of the four
schema predicates themselves — rdfs7 would then mint new schema edges and
the TBox/ABox split stops being one-pass.  ``rdfs_closure`` raises on that
corner rather than silently under-entailing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASS = RDFS_NS + "subClassOf"
RDFS_SUBPROP = RDFS_NS + "subPropertyOf"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"

_SCHEMA_PREDS = (RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE)

# Above this many closed schema edges we stop forcing broadcast and let AQE
# pick the join strategy (the suppress_small_groups lesson: an unconditional
# F.broadcast is a driver OOM waiting for a pathological input).
_BROADCAST_EDGE_LIMIT = 2_000_000


def _transitive(edges: DataFrame, max_iter: int = 64) -> tuple[DataFrame, int]:
    """Transitive closure of an ``(_a, _b)`` edge set (base edges included,
    no reflexive padding).  Semi-naive: each round joins only the NEW pairs
    against the base edges, anti-joins the reached set, and localCheckpoints
    to keep the plan flat.  Rounds are bounded by the hierarchy depth — for
    a schema graph that is single digits.  Returns (closure, edge_count)."""
    base = edges.select("_a", "_b").filter(F.col("_a") != F.col("_b")).distinct()
    step = base.select(F.col("_a").alias("_a2"), F.col("_b").alias("_b2"))
    reach = base.localCheckpoint(eager=True)
    n = reach.count()
    frontier = reach
    for _ in range(max_iter):
        nxt = (
            frontier.join(step, F.col("_b") == F.col("_a2"))
            .select("_a", F.col("_b2").alias("_b"))
            .filter(F.col("_a") != F.col("_b"))
            .distinct()
            .join(reach, ["_a", "_b"], "left_anti")
            .localCheckpoint(eager=True)
        )
        k = nxt.count()
        if not k:
            return reach, n
        frontier = nxt
        reach = reach.unionByName(nxt).localCheckpoint(eager=True)
        n += k
    raise ValueError(f"schema closure did not converge in {max_iter} rounds")


def _maybe_broadcast(df: DataFrame, n: int) -> DataFrame:
    return F.broadcast(df) if n <= _BROADCAST_EDGE_LIMIT else df


def _schema_edges(schema: DataFrame, pred: str) -> DataFrame:
    return schema.filter(
        (F.col("pred") == pred) & F.col("obj_is_iri")
    ).select(F.col("subj").alias("_a"), F.col("obj_value").alias("_b"))


def _as_type_triple(df: DataFrame, subj_col: str, cls_col: str) -> DataFrame:
    return df.select(
        F.col(subj_col).alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        F.col(cls_col).alias("obj_value"),
        F.lit("iri").alias("obj_dtype"),
        F.lit(True).alias("obj_is_iri"),
    )


def rdfs_closure(
    triples: DataFrame,
    schema: DataFrame | None = None,
    include_asserted: bool = True,
    max_iter: int = 64,
) -> DataFrame:
    """Materialize the RDFS (ρdf-fragment) closure of a triple table.

    ``schema`` defaults to the input itself — the usual case where TBox and
    ABox live in one graph, exactly how the reference's Jena Models carry
    soya-context class/attribute descriptions next to the data.  Pass a
    separate ontology table to entail a data graph against an external
    schema without unioning them first.

    Returns the canonical 5-column triple table: asserted ∪ entailed when
    ``include_asserted`` (Jena ``InfModel.listStatements`` semantics),
    entailed-only (novel triples, anti-joined against the input) otherwise.
    """
    schema_in_graph = schema is None
    schema = triples if schema is None else schema

    sp_edges = _schema_edges(schema, RDFS_SUBPROP)
    # ρdf guard: a user property declared subPropertyOf a schema predicate
    # would make rdfs7 mint new TBox edges mid-pass (see module docstring).
    meta = sp_edges.filter(F.col("_b").isin(list(_SCHEMA_PREDS)) | (F.col("_b") == RDF_TYPE))
    if meta.limit(1).count():
        bad = meta.limit(5).collect()
        raise ValueError(
            "rdfs_closure: subPropertyOf into the RDFS vocabulary itself is "
            f"outside the supported ρdf fragment: {[tuple(r) for r in bad]}"
        )

    sp_c, n_sp = _transitive(sp_edges, max_iter)
    sc_c, n_sc = _transitive(_schema_edges(schema, RDFS_SUBCLASS), max_iter)
    sp_b = _maybe_broadcast(sp_c, n_sp)
    sc_b = _maybe_broadcast(sc_c, n_sc)

    cols = ["subj", "pred", "obj_value", "obj_dtype", "obj_is_iri"]
    inst = triples.select(*cols)

    # rdfs7 — property facts propagate up the (closed) property hierarchy.
    derived7 = (
        inst.join(sp_b, inst["pred"] == sp_b["_a"])
        .select(
            "subj",
            F.col("_b").alias("pred"),
            "obj_value",
            "obj_dtype",
            "obj_is_iri",
        )
    )
    prop_facts = inst.unionByName(derived7)

    # rdfs2 / rdfs3 — domain and range typing over asserted ∪ rdfs7-derived.
    dom = _schema_edges(schema, RDFS_DOMAIN)
    rng = _schema_edges(schema, RDFS_RANGE)
    n_dom = dom.count()
    n_rng = rng.count()
    derived2 = _as_type_triple(
        prop_facts.join(_maybe_broadcast(dom, n_dom), prop_facts["pred"] == dom["_a"]),
        "subj",
        "_b",
    )
    derived3 = _as_type_triple(
        prop_facts.filter(F.col("obj_is_iri")).join(
            _maybe_broadcast(rng, n_rng), prop_facts["pred"] == rng["_a"]
        ),
        "obj_value",
        "_b",
    )

    # rdfs9 — every type fact (asserted or minted above) walks the closed
    # class hierarchy.  Runs last so one broadcast join reaches the fixpoint.
    type_facts = (
        prop_facts.filter((F.col("pred") == RDF_TYPE) & F.col("obj_is_iri"))
        .unionByName(derived2)
        .unionByName(derived3)
    )
    derived9 = _as_type_triple(
        type_facts.join(sc_b, type_facts["obj_value"] == sc_b["_a"]), "subj", "_b"
    )

    def _tbox_triples(closure: DataFrame, pred: str) -> DataFrame:
        return closure.select(
            F.col("_a").alias("subj"),
            F.lit(pred).alias("pred"),
            F.col("_b").alias("obj_value"),
            F.lit("iri").alias("obj_dtype"),
            F.lit(True).alias("obj_is_iri"),
        )

    entailed = derived7.unionByName(derived2).unionByName(derived3).unionByName(
        derived9
    )
    if schema_in_graph:
        # rdfs11 / rdfs5 — the schema's own closure belongs to the output
        # only when the schema IS part of the input graph; entailing a data
        # graph against an external ontology leaves the ontology out.
        entailed = entailed.unionByName(
            _tbox_triples(sc_c, RDFS_SUBCLASS)
        ).unionByName(_tbox_triples(sp_c, RDFS_SUBPROP))
    if include_asserted:
        return inst.unionByName(entailed).distinct()
    return entailed.distinct().join(inst, cols, "left_anti")
