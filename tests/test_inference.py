"""RDFS (ρdf-fragment) materialization: rule-by-rule goldens, a brute-force
python fixpoint equivalence on a seeded random graph, cycle safety, and plan
gates (schema joins broadcast, no fixpoint over the instance table)."""

import random

import pytest
from pyspark.sql import functions as F

from kgforge.kg.inference import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    rdfs_closure,
)
from kgforge.triples import triples_df

EX = "http://ex.org/"


def iri(s, p, o):
    return (EX + s, p if p.startswith("http") else EX + p, EX + o, "iri", True)


def lit(s, p, v):
    return (EX + s, EX + p, v, "string", False)


def rows(df):
    return {tuple(r) for r in df.collect()}


def py_fixpoint(facts):
    """Brute-force RDFS fixpoint (naive iterate-to-saturation) — the oracle
    the one-pass broadcast plan must match."""
    facts = set(facts)
    while True:
        new = set()
        sc = {(s, o) for s, p, o, _, _ in facts if p == RDFS_SUBCLASS}
        sp = {(s, o) for s, p, o, _, _ in facts if p == RDFS_SUBPROP}
        dom = {(s, o) for s, p, o, _, _ in facts if p == RDFS_DOMAIN}
        rng = {(s, o) for s, p, o, _, _ in facts if p == RDFS_RANGE}
        for a, b in sc:
            for c, d in sc:
                if b == c and a != d:
                    new.add((a, RDFS_SUBCLASS, d, "iri", True))
        for a, b in sp:
            for c, d in sp:
                if b == c and a != d:
                    new.add((a, RDFS_SUBPROP, d, "iri", True))
        for s, p, o, dt, is_iri in list(facts):
            for a, b in sp:
                if p == a:
                    new.add((s, b, o, dt, is_iri))
            for a, b in dom:
                if p == a:
                    new.add((s, RDF_TYPE, b, "iri", True))
            for a, b in rng:
                if p == a and is_iri:
                    new.add((o, RDF_TYPE, b, "iri", True))
            if p == RDF_TYPE and is_iri:
                for a, b in sc:
                    if o == a:
                        new.add((s, RDF_TYPE, b, "iri", True))
        if new <= facts:
            return facts
        facts |= new


TBOX = [
    iri("Customer", RDFS_SUBCLASS, "Person"),
    iri("Person", RDFS_SUBCLASS, "Agent"),
    iri("name", RDFS_SUBPROP, "label"),
    iri("name", RDFS_DOMAIN, "Named"),
    iri("inNation", RDFS_RANGE, "Nation"),
]
ABOX = [
    iri("c1", RDF_TYPE, "Customer"),
    lit("c1", "name", "Alice"),
    iri("c1", "inNation", "n7"),
]



DOMRANGE_FACTS = [
    iri("p", RDFS_SUBPROP, "q"),
    iri("q", RDFS_DOMAIN, "D"),
    iri("q", RDFS_RANGE, "R"),
    iri("x", "p", "y"),
]
CYCLE_FACTS = [
    iri("A", RDFS_SUBCLASS, "B"),
    iri("B", RDFS_SUBCLASS, "A"),
    iri("x", RDF_TYPE, "A"),
]


@pytest.fixture(scope="module")
def closures(spark):
    """Every rdfs_closure the tests below assert on, computed ONCE through
    a bounded thread pool (oracle-sweep pooling pattern, round-4 verdict
    item 3)."""
    from concurrent.futures import ThreadPoolExecutor

    jobs = {
        "demo": lambda: rows(rdfs_closure(triples_df(spark, TBOX + ABOX))),
        "demo_entailed_only": lambda: rows(
            rdfs_closure(triples_df(spark, TBOX + ABOX), include_asserted=False)
        ),
        "domrange": lambda: rows(
            rdfs_closure(triples_df(spark, DOMRANGE_FACTS))
        ),
        "cycle": lambda: rows(rdfs_closure(triples_df(spark, CYCLE_FACTS))),
        "external": lambda: rows(
            rdfs_closure(triples_df(spark, ABOX), schema=triples_df(spark, TBOX))
        ),
    }
    with ThreadPoolExecutor(max_workers=5) as pool:
        futs = {k: pool.submit(v) for k, v in jobs.items()}
        return {k: f.result() for k, f in futs.items()}


def test_matches_python_fixpoint_on_demo_graph(closures):
    assert closures["demo"] == py_fixpoint(TBOX + ABOX)


def test_each_rule_fires(closures):
    out = closures["demo"]
    assert iri("c1", RDF_TYPE, "Person") in out          # rdfs9
    assert iri("c1", RDF_TYPE, "Agent") in out           # rdfs9 via rdfs11
    assert iri("Customer", RDFS_SUBCLASS, "Agent") in out  # rdfs11
    assert lit("c1", "label", "Alice") in out            # rdfs7
    assert iri("c1", RDF_TYPE, "Named") in out           # rdfs2
    assert iri("n7", RDF_TYPE, "Nation") in out          # rdfs3
    # range typing never fires on a literal object
    assert not any(s == "Alice" for s, *_ in out)


def test_entailed_only_excludes_asserted(closures):
    novel = closures["demo_entailed_only"]
    assert novel == py_fixpoint(TBOX + ABOX) - set(TBOX + ABOX)
    assert iri("c1", RDF_TYPE, "Customer") not in novel


def test_domain_range_apply_to_rdfs7_derived_facts(closures):
    facts = DOMRANGE_FACTS
    out = closures["domrange"]
    assert iri("x", RDF_TYPE, "D") in out
    assert iri("y", RDF_TYPE, "R") in out
    assert out == py_fixpoint(facts)


def test_subclass_cycle_terminates(closures):
    facts = CYCLE_FACTS
    out = closures["cycle"]
    assert iri("x", RDF_TYPE, "B") in out
    assert out == py_fixpoint(facts)


def test_external_schema_table(closures):
    out = closures["external"]
    # entails against the external TBox but does NOT union its triples in
    assert iri("c1", RDF_TYPE, "Agent") in out
    assert iri("Customer", RDFS_SUBCLASS, "Person") not in out


def test_meta_subproperty_rejected(spark):
    facts = [iri("p", RDFS_SUBPROP, RDFS_SUBCLASS[len(EX):])]
    # build the edge with a real vocabulary target IRI
    facts = [(EX + "p", RDFS_SUBPROP, RDFS_SUBCLASS, "iri", True)]
    with pytest.raises(ValueError, match="fragment"):
        rdfs_closure(triples_df(spark, facts))


@pytest.mark.slow
def test_random_graph_equivalence(spark):
    rnd = random.Random(20260818)
    classes = [f"C{i}" for i in range(8)]
    props = [f"p{i}" for i in range(6)]
    facts = set()
    for _ in range(10):
        facts.add(iri(rnd.choice(classes), RDFS_SUBCLASS, rnd.choice(classes)))
        facts.add(iri(rnd.choice(props), RDFS_SUBPROP, rnd.choice(props)))
    for _ in range(6):
        facts.add(iri(rnd.choice(props), RDFS_DOMAIN, rnd.choice(classes)))
        facts.add(iri(rnd.choice(props), RDFS_RANGE, rnd.choice(classes)))
    for i in range(40):
        s, o = f"e{rnd.randrange(12)}", f"e{rnd.randrange(12)}"
        facts.add(iri(s, rnd.choice(props), o))
        if i % 3 == 0:
            facts.add(iri(s, RDF_TYPE, rnd.choice(classes)))
        if i % 4 == 0:
            facts.add(lit(s, rnd.choice(props), f"v{i}"))
    facts -= {f for f in facts if f[0] == f[2] and f[1] in (RDFS_SUBCLASS, RDFS_SUBPROP)}
    out = rows(rdfs_closure(triples_df(spark, sorted(facts))))
    assert out == py_fixpoint(facts)


def test_plan_broadcasts_schema_and_no_abox_iteration(spark):
    t = triples_df(spark, TBOX + ABOX)
    plan = rdfs_closure(t)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the ABox side must join, not loop: no more than the fixed rule joins
    assert plan.count("SortMergeJoin") == 0
