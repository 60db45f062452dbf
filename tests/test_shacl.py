"""SHACL-core validation: per-constraint goldens, conformant-graph empty
report, multi-shape composition, and a plan gate (pred-slice filters, no
cartesian)."""

from pyspark.sql import functions as F

from kgforge.kg.inference import RDF_TYPE
from kgforge.kg.shacl import shacl_validate
from kgforge.triples import triples_df

EX = "http://ex.org/"


def iri(s, p, o):
    return (EX + s, p if p.startswith("http") else EX + p, EX + o, "iri", True)


def typ(s, c):
    return (EX + s, RDF_TYPE, EX + c, "iri", True)


def lit(s, p, v, dt="string"):
    return (EX + s, EX + p, v, dt, False)


def rows(df):
    return {tuple(r) for r in df.collect()}


BASE = [
    typ("c1", "Customer"),
    lit("c1", "name", "Customer#1"),
    iri("c1", "inNation", "n1"),
    typ("n1", "Nation"),
]

SHAPE = {
    "shape": "CustomerShape",
    "target_class": EX + "Customer",
    "property": [
        {"path": EX + "name", "min_count": 1, "max_count": 1,
         "datatype": "string", "pattern": "^Customer#"},
        {"path": EX + "inNation", "node_kind": "IRI", "class": EX + "Nation"},
    ],
}


RANGE_SHAPE = {
    "shape": "BalShape",
    "target_class": EX + "Customer",
    "property": [
        {"path": EX + "bal", "min_inclusive": 0.0, "max_inclusive": 100.0},
        {"path": EX + "seg", "in": ["GOLD", "SILVER"]},
    ],
}
RANGE_DATA = [
    typ("c1", "Customer"),
    lit("c1", "bal", "50.0", "xsd:double"),
    lit("c1", "seg", "GOLD"),
    typ("c2", "Customer"),
    lit("c2", "bal", "-3.5", "xsd:double"),
    lit("c2", "seg", "BRONZE"),
    typ("c3", "Customer"),
    lit("c3", "bal", "abc"),
]
NATION_SHAPE = {
    "shape": "NationShape",
    "target_class": EX + "Nation",
    "property": [{"path": EX + "label", "min_count": 1}],
}


import pytest


@pytest.fixture(scope="module")
def reports(spark, pool_runner):
    """Every validation report once, concurrently (oracle-sweep pooling
    pattern, round-4 verdict item 3); assertions stay per-test below."""
    def run(data, shapes):
        return lambda: rows(shacl_validate(triples_df(spark, data), shapes))

    return pool_runner({
        "conformant": run(BASE, [SHAPE]),
        "mincount": run(BASE + [typ("c2", "Customer")], [SHAPE]),
        "maxcount": run(BASE + [lit("c1", "name", "Customer#1b")], [SHAPE]),
        "datatype": run(BASE + [
            typ("c3", "Customer"),
            lit("c3", "name", "42", "xsd:integer"),
            typ("c4", "Customer"),
            lit("c4", "name", "Anonymous"),
        ], [SHAPE]),
        "nodekind": run(BASE + [
            typ("c5", "Customer"),
            lit("c5", "name", "Customer#5"),
            lit("c5", "inNation", "germany"),
            typ("c6", "Customer"),
            lit("c6", "name", "Customer#6"),
            iri("c6", "inNation", "n99"),
        ], [SHAPE]),
        "range": run(RANGE_DATA, [RANGE_SHAPE]),
        "nontarget": run(BASE + [typ("s1", "Supplier")], [SHAPE]),
        "compose": run(BASE, [SHAPE, NATION_SHAPE]),
    })


def test_conformant_graph_empty_report(reports):
    assert reports["conformant"] == set()


def test_min_count_missing_property(reports):
    out = reports["mincount"]
    assert (EX + "c2", "CustomerShape", EX + "name", "minCount", "0") in out


def test_max_count(reports):
    out = reports["maxcount"]
    assert (EX + "c1", "CustomerShape", EX + "name", "maxCount", "2") in out


def test_datatype_and_pattern(reports):
    out = reports["datatype"]
    assert (EX + "c3", "CustomerShape", EX + "name", "datatype", "42") in out
    assert (EX + "c4", "CustomerShape", EX + "name", "pattern", "Anonymous") in out
    # c3's integer literal also fails the pattern; c4's string passes datatype
    assert (EX + "c4", "CustomerShape", EX + "name", "datatype", "Anonymous") not in out


def test_node_kind_and_class(reports):
    out = reports["nodekind"]
    assert (EX + "c5", "CustomerShape", EX + "inNation", "nodeKind", "germany") in out
    assert (EX + "c5", "CustomerShape", EX + "inNation", "class", "germany") in out
    assert (EX + "c6", "CustomerShape", EX + "inNation", "class", EX + "n99") in out
    assert not any(f == EX + "c6" and c == "nodeKind" for f, _, _, c, _ in out)


def test_range_and_in(reports):
    out = reports["range"]
    assert (EX + "c2", "BalShape", EX + "bal", "minInclusive", "-3.5") in out
    assert (EX + "c2", "BalShape", EX + "seg", "in", "BRONZE") in out
    assert (EX + "c3", "BalShape", EX + "bal", "minInclusive", "abc") in out
    assert not any(f == EX + "c1" for f, *_ in out)


def test_non_targets_ignored(reports):
    # s1 has no name but is not a Customer
    assert reports["nontarget"] == set()


def test_multiple_shapes_compose(reports):
    out = reports["compose"]
    assert out == {(EX + "n1", "NationShape", EX + "label", "minCount", "0")}


def test_plan_no_cartesian(spark):
    plan = (
        shacl_validate(triples_df(spark, BASE), [SHAPE])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
