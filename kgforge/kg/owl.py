"""OWL-micro forward-chaining materialization over the canonical triple table.

The reference manipulates Jena ``Model``s (reference:
service/AnonymizationService.java:41-46); a Jena user upgrades from RDFS to
the *OWL micro* profile (``OntModelSpec.OWL_MEM_MICRO_RULE_INF``) to get
property axioms — ``owl:inverseOf``, ``owl:SymmetricProperty``,
``owl:TransitiveProperty``, ``owl:equivalentClass/Property`` — on top of the
RDFS rules.  This module re-expresses that surface the way
``kgforge/kg/inference.py`` does for ρdf: **materialize once** with
set-oriented DataFrame algebra, never answer entailment per lookup.

Scale shape.  The TBox is driver-sized (it is collected and analyzed there,
like the reference's config graph), the ABox is not:

1. equivalences compile away — ``owl:equivalentProperty`` becomes mutual
   ``rdfs:subPropertyOf`` and ``owl:equivalentClass`` mutual
   ``rdfs:subClassOf`` before the TBox closures run, so no new rule shapes
   touch the instance table;
2. ``owl:SymmetricProperty p`` is exactly ``owl:inverseOf(p, p)`` — one swap
   rule handles both;
3. the up-hierarchy rule (rdfs7) and the swap rule (inverse/symmetric) are
   fused into ONE broadcast "image map" join: a driver-side BFS over the
   pred-level graph (sub-property edges keep orientation, inverse edges flip
   it) precomputes, for every predicate, the full set of (target predicate,
   flipped?) images its facts must be copied to.  Because the map is closed
   at the predicate level, a single join application saturates all
   up/swap consequences — the 100-TB fact table is scanned once, not
   iterated;
4. only ``owl:TransitiveProperty`` iterates, and only over the single
   predicate's edge slice (semi-naive, ``inference._transitive``), never the
   whole graph.  Transitive predicates are processed in topological order of
   the driver-computed "whose closure feeds whom" dependency graph, so the
   common acyclic case needs exactly one closure per predicate; a genuine
   feedback cycle (e.g. two transitive predicates declared inverses of each
   other through a hierarchy) falls back to an outer fixpoint loop whose
   rounds are driven by the derived delta, not the ABox.

Out of scope (documented): equality reasoning (``owl:FunctionalProperty`` →
``owl:sameAs`` minting — OWL micro itself omits it; explicit sameAs merging
is ``kgforge/kg/sameas.py``), cardinality/restriction constructs (that is
validation, ``kgforge/kg/shacl.py``), and the same meta-vocabulary guard as
``rdfs_closure`` (user properties declared subPropertyOf the schema
vocabulary itself).
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.inference import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    _as_type_triple,
    _maybe_broadcast,
    _schema_edges,
    _transitive,
)

OWL_NS = "http://www.w3.org/2002/07/owl#"
OWL_INVERSE = OWL_NS + "inverseOf"
OWL_SYMMETRIC = OWL_NS + "SymmetricProperty"
OWL_TRANSITIVE = OWL_NS + "TransitiveProperty"
OWL_EQ_CLASS = OWL_NS + "equivalentClass"
OWL_EQ_PROP = OWL_NS + "equivalentProperty"

_SCHEMA_PREDS = (
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    RDFS_DOMAIN,
    RDFS_RANGE,
    OWL_INVERSE,
    OWL_EQ_CLASS,
    OWL_EQ_PROP,
)

_COLS = ["subj", "pred", "obj_value", "obj_dtype", "obj_is_iri"]


def _pairs(schema: DataFrame, pred: str) -> list[tuple[str, str]]:
    """Driver-side (TBox-sized) edge list for one schema predicate."""
    return [
        (r["_a"], r["_b"])
        for r in _schema_edges(schema, pred).distinct().collect()
    ]


def _close_pairs(pairs: set[tuple[str, str]]) -> set[tuple[str, str]]:
    """Transitive closure of a driver-sized pair set (irreflexive)."""
    out = {(a, b) for a, b in pairs if a != b}
    while True:
        new = {
            (a, d)
            for a, b in out
            for c, d in out
            if b == c and a != d and (a, d) not in out
        }
        if not new:
            return out
        out |= new


def _image_map(
    sp: set[tuple[str, str]], inv: set[tuple[str, str]]
) -> dict[str, set[tuple[str, bool, bool]]]:
    """For every predicate, the set of (target predicate, flipped?,
    literal-safe?) images a fact of that predicate propagates to — the
    pred-level closure of the up (rdfs7, keeps orientation) and swap
    (inverseOf, flips it) rules.  A chain is literal-safe only when it is
    pure-up: ANY swap step — even one whose parity later cancels — requires
    an IRI in object position at that point, which a literal-object fact
    never has.  BFS with parity; identity image excluded."""
    preds = {a for a, _ in sp} | {b for _, b in sp} | {
        p for pair in inv for p in pair
    }
    up: dict[str, set[str]] = {}
    swap: dict[str, set[str]] = {}
    for a, b in sp:
        up.setdefault(a, set()).add(b)
    for a, b in inv:
        swap.setdefault(a, set()).add(b)
        swap.setdefault(b, set()).add(a)
    images: dict[str, set[tuple[str, bool, bool]]] = {}
    for src in preds:
        # state: (pred, flipped, swap-free so far); swap-free dominates, so
        # track it in the state to keep BFS exact.
        start = (src, False, True)
        seen = {start}
        q = deque([start])
        while q:
            p, flipped, pure = q.popleft()
            for t in up.get(p, ()):  # orientation preserved
                s = (t, flipped, pure)
                if s not in seen:
                    seen.add(s)
                    q.append(s)
            for t in swap.get(p, ()):  # orientation flips; chain no longer literal-safe
                s = (t, not flipped, False)
                if s not in seen:
                    seen.add(s)
                    q.append(s)
        # collapse states: an image is literal-safe if ANY reaching chain is
        best: dict[tuple[str, bool], bool] = {}
        for t, flipped, pure in seen:
            key = (t, flipped)
            best[key] = best.get(key, False) or pure
        best.pop((src, False), None)
        if best:
            images[src] = {(t, fl, pure) for (t, fl), pure in best.items()}
    return images


def _topo_transitive(
    trans: set[str], images: dict[str, set[tuple[str, bool, bool]]]
) -> tuple[list[str], bool]:
    """Order transitive predicates so every feeder closes before what it
    feeds (u before t when t is an image of u).  Returns (order, cyclic)."""
    dep: dict[str, set[str]] = {t: set() for t in trans}
    for u in trans:
        for t, _, _ in images.get(u, ()):  # u's closure output lands on t
            if t in trans and t != u:
                dep[t].add(u)
    order: list[str] = []
    ready = sorted(t for t, d in dep.items() if not d)
    pending = {t: set(d) for t, d in dep.items() if d}
    while ready:
        u = ready.pop(0)
        order.append(u)
        for t in sorted(pending):
            pending[t].discard(u)
            if not pending[t]:
                del pending[t]
                ready.append(t)
        ready.sort()
    if pending:  # feedback cycle — caller must iterate to fixpoint
        return order + sorted(pending), True
    return order, False


def _apply_images(
    facts: DataFrame, images: dict[str, set[tuple[str, bool, bool]]], spark
) -> DataFrame:
    """One broadcast join applying the closed pred-level image map: copies
    each fact to every (target, flipped?) image.  Literal-object facts only
    take literal-safe (pure-up) images — any swap step needs an IRI object."""
    rows = [
        (src, dst, flipped, lit_safe)
        for src, imgs in images.items()
        for dst, flipped, lit_safe in imgs
    ]
    if not rows:
        return facts.filter(F.lit(False)).select(*_COLS)
    m = F.broadcast(
        spark.createDataFrame(rows, ["_src", "_dst", "_flip", "_lit_safe"])
    )
    j = facts.join(m, facts["pred"] == m["_src"]).filter(
        F.col("_lit_safe") | F.col("obj_is_iri")
    )
    return j.select(
        F.when(F.col("_flip"), F.col("obj_value")).otherwise(F.col("subj")).alias("subj"),
        F.col("_dst").alias("pred"),
        F.when(F.col("_flip"), F.col("subj")).otherwise(F.col("obj_value")).alias("obj_value"),
        F.when(F.col("_flip"), F.lit("iri")).otherwise(F.col("obj_dtype")).alias("obj_dtype"),
        F.when(F.col("_flip"), F.lit(True)).otherwise(F.col("obj_is_iri")).alias("obj_is_iri"),
    )


def owl_closure(
    triples: DataFrame,
    schema: DataFrame | None = None,
    include_asserted: bool = True,
    max_iter: int = 64,
) -> DataFrame:
    """Materialize the OWL-micro closure (RDFS ρdf + inverse / symmetric /
    transitive / equivalence axioms) of a triple table.

    ``schema`` defaults to the input itself (TBox and ABox in one graph,
    how the reference's Jena Models carry soya-context descriptions next to
    the data); pass a separate ontology table to entail against an external
    schema.  Returns asserted ∪ entailed when ``include_asserted`` (Jena
    ``InfModel.listStatements`` semantics), else the novel triples only.
    """
    schema_in_graph = schema is None
    schema = triples if schema is None else schema
    spark = triples.sparkSession

    # --- TBox (driver-sized, like the reference's config graph) ---------
    sp_raw = set(_pairs(schema, RDFS_SUBPROP))
    meta = {
        (a, b)
        for a, b in sp_raw
        if b in _SCHEMA_PREDS or b == RDF_TYPE
    }
    if meta:
        raise ValueError(
            "owl_closure: subPropertyOf into the schema vocabulary itself is "
            f"outside the supported fragment: {sorted(meta)[:5]}"
        )
    eq_p = set(_pairs(schema, OWL_EQ_PROP))
    sp = _close_pairs(sp_raw | eq_p | {(b, a) for a, b in eq_p})
    bad_meta = {
        a
        for pred in (RDFS_DOMAIN, RDFS_RANGE)
        for a, _ in _pairs(schema, pred)
        if a in _SCHEMA_PREDS or a == RDF_TYPE
    }
    if bad_meta:
        raise ValueError(
            "owl_closure: domain/range declared on the schema vocabulary "
            f"itself is outside the supported fragment: {sorted(bad_meta)[:5]}"
        )

    sc_raw = set(_pairs(schema, RDFS_SUBCLASS))
    eq_c = set(_pairs(schema, OWL_EQ_CLASS))
    sc = _close_pairs(sc_raw | eq_c | {(b, a) for a, b in eq_c})

    inv = set(_pairs(schema, OWL_INVERSE))
    inv |= {(b, a) for a, b in inv}
    trait = schema.filter(
        (F.col("pred") == RDF_TYPE) & F.col("obj_is_iri")
    )
    symmetric = {
        r["subj"]
        for r in trait.filter(F.col("obj_value") == OWL_SYMMETRIC)
        .select("subj").distinct().collect()
    }
    inv |= {(p, p) for p in symmetric}
    trans = {
        r["subj"]
        for r in trait.filter(F.col("obj_value") == OWL_TRANSITIVE)
        .select("subj").distinct().collect()
    }

    images = _image_map(sp, inv)
    order, cyclic = _topo_transitive(trans, images)

    # --- ABox saturation: one image-map join, then per-pred closures ----
    inst = triples.select(*_COLS)
    saturated = (
        inst.unionByName(_apply_images(inst, images, spark))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = max_iter if cyclic else 1
    for _ in range(rounds):
        grew = False
        for t in order:
            edges = saturated.filter(
                (F.col("pred") == t) & F.col("obj_is_iri")
            ).select(F.col("subj").alias("_a"), F.col("obj_value").alias("_b"))
            closed, _n = _transitive(edges, max_iter)
            new_pairs = closed.join(edges.distinct(), ["_a", "_b"], "left_anti")
            new_facts = new_pairs.select(
                F.col("_a").alias("subj"),
                F.lit(t).alias("pred"),
                F.col("_b").alias("obj_value"),
                F.lit("iri").alias("obj_dtype"),
                F.lit(True).alias("obj_is_iri"),
            )
            delta = new_facts.unionByName(
                _apply_images(new_facts, {t: images[t]} if t in images else {}, spark)
            ).join(saturated, _COLS, "left_anti")
            delta = delta.localCheckpoint(eager=True)
            if delta.limit(1).count():
                grew = True
                saturated = (
                    saturated.unionByName(delta)
                    .localCheckpoint(eager=True)
                )
        if not grew:
            break
    else:
        if cyclic:
            raise ValueError(
                f"owl_closure: transitive feedback did not converge in {max_iter} rounds"
            )

    # --- typing: rdfs2/3 over saturated facts, rdfs9 over closed sc -----
    dom = _schema_edges(schema, RDFS_DOMAIN)
    rng = _schema_edges(schema, RDFS_RANGE)
    n_dom = dom.count()
    n_rng = rng.count()
    derived2 = _as_type_triple(
        saturated.join(_maybe_broadcast(dom, n_dom), saturated["pred"] == dom["_a"]),
        "subj",
        "_b",
    )
    derived3 = _as_type_triple(
        saturated.filter(F.col("obj_is_iri")).join(
            _maybe_broadcast(rng, n_rng), saturated["pred"] == rng["_a"]
        ),
        "obj_value",
        "_b",
    )
    type_facts = (
        saturated.filter((F.col("pred") == RDF_TYPE) & F.col("obj_is_iri"))
        .unionByName(derived2)
        .unionByName(derived3)
    )
    sc_df = spark.createDataFrame(
        [(a, b) for a, b in sorted(sc)] or [("", "")], ["_a", "_b"]
    )
    if not sc:
        sc_df = sc_df.filter(F.lit(False))
    sc_b = _maybe_broadcast(sc_df, len(sc))
    derived9 = _as_type_triple(
        type_facts.join(sc_b, type_facts["obj_value"] == sc_b["_a"]), "subj", "_b"
    )

    entailed = saturated.unionByName(derived2).unionByName(derived3).unionByName(
        derived9
    )
    if schema_in_graph and (sc or sp):
        tbox_rows = [
            (a, RDFS_SUBCLASS, b, "iri", True) for a, b in sorted(sc)
        ] + [(a, RDFS_SUBPROP, b, "iri", True) for a, b in sorted(sp)]
        entailed = entailed.unionByName(
            spark.createDataFrame(tbox_rows, _COLS)
        )
    if include_asserted:
        return inst.unionByName(entailed).distinct()
    return entailed.distinct().join(inst, _COLS, "left_anti")
