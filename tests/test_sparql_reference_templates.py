"""Every SPARQL template the reference builds runs UNCHANGED on kgforge.

The reference interacts with its Jena Model exclusively through the 11
query templates in ``data/QueryBuildingService.java`` (plus the two
overloads), parameterized via ``ParameterizedSparqlString.setParam`` —
which substitutes concrete IRIs into the template text.  These tests
instantiate each template exactly as the Java code would and execute the
resulting string on ``kgforge.sparql`` over a graph shaped like the
reference's config + data models — proving a Jena user's actual query
strings run verbatim after the switch.

Template provenance (reference file:line):
  createConfigQuery                  QueryBuildingService.java:15
  createDataModelQuery               QueryBuildingService.java:31
  createAttributeOrderQuery          QueryBuildingService.java:48
  createKpiDataQuery                 QueryBuildingService.java:65
  createPropertyQuery (EXISTS)       QueryBuildingService.java:81
  deleteOriginalPropertyQuery        QueryBuildingService.java:98
  createRandomizationQuery           QueryBuildingService.java:126
  createGroupsQuery                  QueryBuildingService.java:142
  createPropertyQuery (isLiteral)    QueryBuildingService.java:165
  createGeneralizationData           QueryBuildingService.java:175
  createKAnonymityQuery              QueryBuildingService.java:206
  createTypesForResourcesQuery       QueryBuildingService.java:224
  createAttributeInformationQuery    QueryBuildingService.java:241
"""

from __future__ import annotations

import pytest

from kgforge.sparql import sparql_delete, sparql_select
from kgforge.triples import triples_df

EX = "http://ex.org/"
SOYA = "https://w3id.org/soya/ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_MIN = RDFS + "min"  # Generalization.java:16-17
RDF_MAX = RDFS + "max"


@pytest.fixture(scope="module")
def model(spark):
    """Config + data graph shaped like the reference's merged Model."""
    t = RDF + "type"
    rows = [
        # --- soya configuration (createConfigQuery's shape) ---
        (EX + "overlay", t, SOYA + "OverlayClassification", "iri", True),
        (EX + "overlay", SOYA + "onBase", EX + "Person", "iri", True),
        (EX + "age", RDFS + "domain", EX + "Person", "iri", True),
        (EX + "age", RDFS + "range", XSD + "decimal", "iri", True),
        (EX + "age", SOYA + "classification", "generalization", "string", False),
        (EX + "name", RDFS + "domain", EX + "Person", "iri", True),
        (EX + "name", RDFS + "range", XSD + "string", "iri", True),
        (EX + "name", SOYA + "classification", "masking", "string", False),
        # classification outside the VALUES list -> excluded
        (EX + "city", RDFS + "domain", EX + "Person", "iri", True),
        (EX + "city", RDFS + "range", XSD + "string", "iri", True),
        (EX + "city", SOYA + "classification", "suppression", "string", False),
        # IRI-valued classification -> excluded by FILTER(isLiteral(...))
        (EX + "zip", RDFS + "domain", EX + "Person", "iri", True),
        (EX + "zip", RDFS + "range", XSD + "string", "iri", True),
        (EX + "zip", SOYA + "classification", "generalization", "iri", True),
        # attributeOrder cons-list hanging off an IRI classification node
        (EX + "age", SOYA + "classification", EX + "ageClass", "iri", True),
        (EX + "ageClass", SOYA + "attributeOrder", EX + "L1", "iri", True),
        (EX + "L1", RDF + "first", "low", "string", False),
        (EX + "L1", RDF + "rest", EX + "L2", "iri", True),
        (EX + "L2", RDF + "first", "mid", "string", False),
        (EX + "L2", RDF + "rest", EX + "L3", "iri", True),
        (EX + "L3", RDF + "first", "high", "string", False),
        (EX + "L3", RDF + "rest", RDF + "nil", "iri", True),
        # --- data model ---
        (EX + "p1", t, EX + "Person", "iri", True),
        (EX + "p1", EX + "name", "Ada", "string", False),
        (EX + "p1", EX + "age", "36", "xsd:decimal", False),
        (EX + "p1", EX + "age_randomized", "37.2", "xsd:decimal", False),
        (EX + "p1", EX + "age_generalized", EX + "b1", "iri", True),
        (EX + "p2", t, EX + "Person", "iri", True),
        (EX + "p2", EX + "name", "Grace", "string", False),
        (EX + "p2", EX + "age", "41", "xsd:decimal", False),
        (EX + "p2", EX + "age_randomized", "40.1", "xsd:decimal", False),
        (EX + "p2", EX + "age_generalized", EX + "b1", "iri", True),
        (EX + "p3", t, EX + "Person", "iri", True),
        (EX + "p3", EX + "name", "Linus", "string", False),
        # the shared bucket entity with its bounds (W4 quirk shape)
        (EX + "b1", RDF_MIN, "30", "xsd:decimal", False),
        (EX + "b1", RDF_MAX, "45", "xsd:decimal", False),
        # --- KPI object ---
        (EX + "kpi1", EX + "score", "0.95", "xsd:decimal", False),
        (EX + "kpi1", EX + "hasAttribute", EX + "attrA", "iri", True),
        (EX + "attrA", EX + "nrBuckets", "5", "xsd:integer", False),
        (EX + "attrA", EX + "anonymization", "generalization", "string", False),
        # --- flat-json typed resource ---
        (EX + "r1", t, EX + "FlatJsonObject", "iri", True),
        (EX + "r1", t, EX + "Order", "iri", True),
    ]
    return triples_df(spark, rows).persist()


def test_config_query(model):
    # createConfigQuery — verbatim, zero parameters
    out = sparql_select(model, """
        PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        PREFIX soya: <https://w3id.org/soya/ns#>
        SELECT ?anonymizationObject ?property ?datatype ?anonymization WHERE {
          ?overlay a soya:OverlayClassification .
          ?overlay soya:onBase ?anonymizationObject .
          ?property rdfs:domain ?anonymizationObject .
          ?property rdfs:range ?datatype .
          ?property <https://w3id.org/soya/ns#classification> ?anonymization .
          FILTER(isLiteral(?anonymization))
          VALUES ?anonymization { "generalization" "randomization" "masking" }
        }
    """).collect()
    got = sorted((r["property"], r["datatype"], r["anonymization"]) for r in out)
    assert got == [
        (EX + "age", XSD + "decimal", "generalization"),
        (EX + "name", XSD + "string", "masking"),
    ]


def test_data_model_query(model):
    # createDataModelQuery(properties=[name, age], object=ex:Person)
    out = sparql_select(model, f"""
        SELECT ?object ?_name ?_age
        WHERE {{
          ?object a <{EX}Person>.
          OPTIONAL {{ ?object <{EX}name> ?_name. }}
          OPTIONAL {{ ?object <{EX}age> ?_age. }}
        }}
    """).collect()
    got = sorted((r["object"], r["_name"], r["_age"]) for r in out)
    assert got == [
        (EX + "p1", "Ada", "36"),
        (EX + "p2", "Grace", "41"),
        (EX + "p3", "Linus", None),
    ]


def test_attribute_order_query(model):
    # createAttributeOrderQuery(attribute=ex:age): rdf:rest*/rdf:first walk
    out = sparql_select(model, f"""
        PREFIX soya: <https://w3id.org/soya/ns#>
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT ?value
        WHERE {{
            <{EX}age> soya:classification ?o .
            ?o soya:attributeOrder ?head .
            ?head rdf:rest* ?cell .
            ?cell rdf:first ?value .
        }}
    """).collect()
    assert sorted(r["value"] for r in out) == ["high", "low", "mid"]


def test_kpi_data_query_unit_solution(model):
    # createKpiDataQuery({score}, kpiObject): a WHERE of ONLY an OPTIONAL
    # whose subject is the substituted constant — extends the unit solution
    out = sparql_select(model, f"""
        SELECT ?_score
        WHERE {{
          OPTIONAL {{ <{EX}kpi1> <{EX}score> ?_score FILTER(isLiteral(?_score)) }}
        }}
    """).collect()
    assert [r["_score"] for r in out] == ["0.95"]
    # no-match subject: Jena returns ONE row with ?_score unbound
    out2 = sparql_select(model, f"""
        SELECT ?_score
        WHERE {{
          OPTIONAL {{ <{EX}nokpi> <{EX}score> ?_score FILTER(isLiteral(?_score)) }}
        }}
    """).collect()
    assert [r["_score"] for r in out2] == [None]


def test_property_query_exists_projection(model):
    # createPropertyQuery(configs={name, age, city}, object=ex:Person)
    out = sparql_select(model, f"""
        SELECT ?predicate (EXISTS {{
          ?s a <{EX}Person> ; ?predicate ?o .
        }} AS ?used)
        WHERE {{ VALUES ?predicate {{ <{EX}name> <{EX}age> <{EX}city> }} }}
    """).collect()
    got = {r["predicate"]: r["used"] for r in out}
    assert got == {
        EX + "name": "true", EX + "age": "true", EX + "city": "false"
    }


def test_delete_original_property_query(model):
    # deleteOriginalPropertyQuery({age_generalized}, ex:Person): deletes the
    # property triples AND one-hop cascades into the shared bucket entity
    survivors = sparql_delete(model, f"""
        DELETE {{
          ?object ?prop ?value .
          ?value ?p ?o .
        }}
        WHERE {{
          ?object a <{EX}Person> .
          ?object ?prop ?value .
          VALUES ?prop {{
            <{EX}age_generalized>
          }}
          OPTIONAL {{ ?value ?p ?o . }}
        }}
    """)
    gone = {
        (EX + "p1", EX + "age_generalized", EX + "b1"),
        (EX + "p2", EX + "age_generalized", EX + "b1"),
        (EX + "b1", RDF_MIN, "30"),
        (EX + "b1", RDF_MAX, "45"),
    }
    left = {(r["subj"], r["pred"], r["obj_value"]) for r in survivors.collect()}
    assert gone & left == set()
    assert survivors.count() == model.count() - len(gone)
    # literal-valued property: no cascade, only the property triples go
    survivors2 = sparql_delete(model, f"""
        DELETE {{
          ?object ?prop ?value .
          ?value ?p ?o .
        }}
        WHERE {{
          ?object a <{EX}Person> .
          ?object ?prop ?value .
          VALUES ?prop {{
            <{EX}age>
          }}
          OPTIONAL {{ ?value ?p ?o . }}
        }}
    """)
    assert survivors2.count() == model.count() - 2
    assert survivors2.filter(
        survivors2.pred == EX + "age"
    ).count() == 0


def test_randomization_query(model):
    # createRandomizationQuery(ex:Person, ex:age)
    out = sparql_select(model, f"""
        SELECT ?object ?randomized ?original
        WHERE {{
            ?object a <{EX}Person> .
            OPTIONAL {{ ?object <{EX}age> ?original . }}
            OPTIONAL {{ ?object <{EX}age_randomized> ?randomized . }}
        }}
    """).collect()
    got = sorted((r["object"], r["randomized"], r["original"]) for r in out)
    assert got == [
        (EX + "p1", "37.2", "36"),
        (EX + "p2", "40.1", "41"),
        (EX + "p3", None, None),
    ]


def test_groups_query_group_concat(model):
    # createGroupsQuery({age}, ex:Person): GROUP_CONCAT per generalized value
    out = sparql_select(model, f"""
        SELECT (GROUP_CONCAT(?object; SEPARATOR=", ") AS ?values)
        WHERE {{
          ?object a <{EX}Person> .
          OPTIONAL {{ ?object <{EX}age_generalized> ?v0 . }}
        }}
        GROUP BY ?v0
    """).collect()
    assert sorted(r["values"] for r in out) == [
        f"{EX}p1, {EX}p2", EX + "p3"
    ]


def test_property_query_is_literal(model):
    # createPropertyQuery(ex:Person) — literal-valued predicates, multiset
    out = sparql_select(model, f"""
        SELECT ?predicate
        WHERE {{
          ?s a <{EX}Person> ; ?predicate ?o .
          FILTER(isLiteral(?o))
        }}
    """).collect()
    got = sorted(r["predicate"] for r in out)
    assert got == sorted(
        [EX + "name"] * 3 + [EX + "age"] * 2 + [EX + "age_randomized"] * 2
    )


def test_generalization_data_query(model):
    # createGeneralizationData({age_generalized}, ex:Person): bucket bounds
    # through the repeated-OPTIONAL idiom
    out = sparql_select(model, f"""
        SELECT ?object ?_g ?_min_g ?_max_g
        WHERE {{
          ?object a <{EX}Person>.
          OPTIONAL {{
            ?object <{EX}age_generalized> ?_g.
          }}
          OPTIONAL {{
            ?object <{EX}age_generalized> ?_g.
            ?_g <{RDF_MAX}> ?_max_g.
          }}
          OPTIONAL {{
            ?object <{EX}age_generalized> ?_g.
            ?_g <{RDF_MIN}> ?_min_g.
          }}
        }}
    """).collect()
    got = sorted((r["object"], r["_g"], r["_min_g"], r["_max_g"]) for r in out)
    assert got == [
        (EX + "p1", EX + "b1", "30", "45"),
        (EX + "p2", EX + "b1", "30", "45"),
        (EX + "p3", None, None, None),
    ]


def test_k_anonymity_query(model):
    # createKAnonymityQuery([p1, p2], ex:age)
    out = sparql_select(model, f"""
        SELECT ?object ?value
        WHERE {{
          VALUES ?object {{ <{EX}p1> <{EX}p2> }}
          ?object <{EX}age> ?value .
        }}
    """).collect()
    assert sorted((r["object"], r["value"]) for r in out) == [
        (EX + "p1", "36"), (EX + "p2", "41")
    ]


def test_types_for_resources_query(model):
    # createTypesForResourcesQuery(ex:FlatJsonObject)
    out = sparql_select(model, f"""
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT DISTINCT ?resource ?type
        WHERE {{
          ?resource rdf:type <{EX}FlatJsonObject> .
          ?resource rdf:type ?type .
          FILTER(?type != <{EX}FlatJsonObject>)
        }}
    """).collect()
    assert [(r["resource"], r["type"]) for r in out] == [
        (EX + "r1", EX + "Order")
    ]


def test_attribute_information_query(model):
    # createAttributeInformationQuery([kpi1], hasAttribute, nrBuckets, anonymization)
    out = sparql_select(model, f"""
        SELECT ?kpiObject ?attribute ?anonymization ?nrBuckets
        WHERE {{
          VALUES ?kpiObject {{ <{EX}kpi1> }}
          ?kpiObject <{EX}hasAttribute> ?attribute .
          OPTIONAL {{?attribute <{EX}nrBuckets> ?nrBuckets . }}
          ?attribute <{EX}anonymization> ?anonymization .
        }}
    """).collect()
    assert [(r["kpiObject"], r["attribute"], r["anonymization"], r["nrBuckets"])
            for r in out] == [(EX + "kpi1", EX + "attrA", "generalization", "5")]
