from kgforge.kg.schema import RDF_TYPE, induce_domain_range

_SCHEMA = "subj string, pred string, obj_value string, obj_dtype string, obj_is_iri boolean"


def _t(s, p, o, dtype=None, iri=True):
    return (s, p, o, dtype, iri)


def test_domain_range_induction(spark):
    rows = [
        _t("p1", RDF_TYPE, "Person"),
        _t("p2", RDF_TYPE, "Person"),
        _t("c1", RDF_TYPE, "City"),
        # livesIn: Person -> City (2 of 2), one untyped subject
        _t("p1", "livesIn", "c1"),
        _t("p2", "livesIn", "c1"),
        _t("x9", "livesIn", "c1"),
        # age: Person -> integer literal
        _t("p1", "age", "41", dtype="xsd:int", iri=False),
        _t("p2", "age", "7", dtype="xsd:int", iri=False),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {r["pred"]: r.asDict() for r in induce_domain_range(df).collect()}
    assert set(got) == {"livesIn", "age"}
    li = got["livesIn"]
    assert li["n_triples"] == 3
    assert li["domain_class"] == "Person" and li["domain_support"] == 0.666667
    assert li["range_class"] == "City" and li["range_support"] == 1.0
    ag = got["age"]
    assert ag["domain_class"] == "Person" and ag["domain_support"] == 1.0
    assert ag["range_class"] == "literal:xsd:int" and ag["range_support"] == 1.0


def test_domain_tie_breaks_by_class_name(spark):
    rows = [
        _t("a", RDF_TYPE, "Zebra"),
        _t("b", RDF_TYPE, "Ant"),
        _t("a", "eats", "g"),
        _t("b", "eats", "g"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = induce_domain_range(df).collect()[0]
    assert got["domain_class"] == "Ant"  # 1-1 tie -> lexicographic
    assert got["range_class"] == "untyped"


def test_multityped_subject_counts_each_class(spark):
    rows = [
        _t("a", RDF_TYPE, "Person"),
        _t("a", RDF_TYPE, "Employee"),
        _t("a", "worksAt", "w"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = induce_domain_range(df).collect()[0]
    # one triple, two classes with count 1 each -> tie -> Employee first
    assert got["n_triples"] == 1
    assert got["domain_class"] == "Employee"
    assert got["domain_support"] == 1.0
