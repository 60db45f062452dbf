"""owl:sameAs smushing: cluster collapse, chain/symmetric closure,
literal & predicate immunity, provenance emission, dedup of collapsed
descriptions."""

from kgforge.kg.inference import RDF_TYPE
from kgforge.kg.sameas import OWL_SAMEAS, smush_sameas
from kgforge.triples import triples_df

EX = "http://ex.org/"


def iri(s, p, o):
    return (EX + s, p if p.startswith("http") else EX + p, EX + o, "iri", True)


def same(a, b):
    return (EX + a, OWL_SAMEAS, EX + b, "iri", True)


def lit(s, p, v):
    return (EX + s, EX + p, v, "string", False)


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_chain_collapses_to_min_rep(spark):
    data = [
        same("b", "c"), same("a", "b"),          # a~b~c, rep = a (min IRI)
        lit("a", "name", "Alice"),
        lit("c", "name", "Alice"),               # duplicate description
        lit("c", "age", "30"),
        iri("x", "knows", "c"),                  # object rewrite
    ]
    out = rows(smush_sameas(triples_df(spark, data)))
    assert out == {
        lit("a", "name", "Alice"),
        lit("a", "age", "30"),
        iri("x", "knows", "a"),
        same("a", "b"),
        same("a", "c"),
    }


def test_symmetric_assertions_one_cluster(spark):
    data = [same("p", "q"), same("q", "p"), lit("q", "v", "1")]
    out = rows(smush_sameas(triples_df(spark, data)))
    assert out == {lit("p", "v", "1"), same("p", "q")}


def test_literals_and_predicates_untouched(spark):
    # an alias IRI appearing as a literal VALUE or as a predicate stays put
    data = [
        same("a", "b"),
        (EX + "x", EX + "b", "payload", "string", False),     # pred named like alias
        (EX + "x", EX + "note", EX + "b", "string", False),   # literal that looks like the IRI
    ]
    out = rows(smush_sameas(triples_df(spark, data)))
    assert (EX + "x", EX + "b", "payload", "string", False) in out
    assert (EX + "x", EX + "note", EX + "b", "string", False) in out


def test_no_sameas_is_identity_plus_dedup(spark):
    data = [lit("a", "name", "A"), lit("a", "name", "A"), iri("a", RDF_TYPE, "T")]
    out = rows(smush_sameas(triples_df(spark, data)))
    assert out == {lit("a", "name", "A"), iri("a", RDF_TYPE, "T")}


def test_provenance_off(spark):
    data = [same("a", "b"), lit("b", "v", "1")]
    out = rows(smush_sameas(triples_df(spark, data), keep_provenance=False))
    assert out == {lit("a", "v", "1")}
