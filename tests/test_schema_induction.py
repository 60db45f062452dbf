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


# ------------------------------------------------------- subsumption mining
def _assert_df(spark, items):
    return spark.createDataFrame(
        [(n, c) for n, c in items], "node int, cls string"
    )


def test_subsumption_exact_containment(spark):
    from kgforge.kg.schema import induce_subsumption

    # every Cat is an Animal; one Dog is also an Animal
    items = [
        (1, "Cat"), (1, "Animal"),
        (2, "Cat"), (2, "Animal"),
        (3, "Dog"), (3, "Animal"),
        (4, "Dog"),
        (5, "Animal"),
    ]
    got = {
        (r.sub, r.sup): r
        for r in induce_subsumption(
            _assert_df(spark, items), min_support=2, min_conf=0.9
        ).collect()
    }
    assert ("Cat", "Animal") in got
    r = got[("Cat", "Animal")]
    assert (r.n_sub, r.n_both, r.confidence, r.is_exact) == (2, 2, 1.0, True)
    # Dog -> Animal has confidence 0.5 -> filtered
    assert ("Dog", "Animal") not in got
    # Animal -> Cat has confidence 2/4 -> filtered
    assert ("Animal", "Cat") not in got


def test_subsumption_near_containment_flagged_not_exact(spark):
    from kgforge.kg.schema import induce_subsumption

    items = [(i, "A") for i in range(10)] + [
        (i, "B") for i in range(9)
    ]
    got = {
        (r.sub, r.sup): r
        for r in induce_subsumption(
            _assert_df(spark, items), min_support=2, min_conf=0.9
        ).collect()
    }
    r = got[("B", "A")]
    assert r.confidence == 1.0 and r.is_exact
    # A -> B: 9/10 = 0.9 passes the threshold but is not exact
    r2 = got[("A", "B")]
    assert r2.confidence == 0.9 and not r2.is_exact


def test_subsumption_min_support(spark):
    from kgforge.kg.schema import induce_subsumption

    items = [(1, "Rare"), (1, "Common"), (2, "Common")]
    got = induce_subsumption(
        _assert_df(spark, items), min_support=2, min_conf=0.9
    ).collect()
    assert got == []  # Rare has support 1; Common->Rare conf 0.5


# ------------------------------------------------- predicate cardinality
def test_predicate_cardinality_profile(spark):
    from pyspark.sql import Row

    from kgforge.kg.schema import RDF_TYPE, predicate_cardinality

    rows = [
        # functional: one name per subject, names shared (not inv-func)
        Row(subj="a", pred="name", obj_value="x"),
        Row(subj="b", pred="name", obj_value="x"),
        # inverse-functional: emails unique per object
        Row(subj="a", pred="email", obj_value="a@x"),
        Row(subj="b", pred="email", obj_value="b@x"),
        # multi-valued
        Row(subj="a", pred="tag", obj_value="t1"),
        Row(subj="a", pred="tag", obj_value="t2"),
        # type triples are excluded
        Row(subj="a", pred=RDF_TYPE, obj_value="T"),
    ]
    got = {
        r.pred: r
        for r in predicate_cardinality(spark.createDataFrame(rows)).collect()
    }
    assert RDF_TYPE not in got
    nm = got["name"]
    assert (nm.is_functional, nm.is_inverse_functional) == (True, False)
    assert nm.n_obj == 1 and nm.max_per_obj == 2
    em = got["email"]
    assert (em.is_functional, em.is_inverse_functional) == (True, True)
    tg = got["tag"]
    assert not tg.is_functional and tg.max_per_subj == 2
    assert tg.avg_per_subj == 2.0
