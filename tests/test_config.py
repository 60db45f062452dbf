"""Config-KG extraction (P1/J6): SOyA-shaped JSON-LD → AnonymizationConfig."""

from __future__ import annotations

import pytest

from kgforge.config import OntologyError, extract_config
from kgforge.ingest import jsonld_to_triple_tuples

SOYA = "https://w3id.org/soya/ns#"
BASE = "https://example.org/Demo/"

CONFIG_DOC = {
    "@context": {
        "soya": "https://w3id.org/soya/ns#",
        "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
        "ex": BASE,
    },
    "@graph": [
        {"@id": "ex:overlay", "@type": "soya:OverlayClassification",
         "soya:onBase": {"@id": "ex:Demo"}},
        {"@id": "ex:name", "rdfs:domain": {"@id": "ex:Demo"},
         "rdfs:range": {"@id": "ex:string"},
         "soya:classification": "masking"},
        {"@id": "ex:gehalt", "rdfs:domain": {"@id": "ex:Demo"},
         "rdfs:range": {"@id": "ex:integer"},
         "soya:classification": "generalization"},
        {"@id": "ex:geburtsdatum", "rdfs:domain": {"@id": "ex:Demo"},
         "rdfs:range": {"@id": "ex:date"},
         "soya:classification": "randomization"},
        {"@id": "ex:adresse", "rdfs:domain": {"@id": "ex:Demo"},
         "rdfs:range": {"@id": "ex:address"},
         "soya:classification": [
             "generalization",
             {"@id": "ex:adresseCls"},
         ]},
        {"@id": "ex:adresseCls",
         "soya:attributeOrder": {"@list": ["city", "state", "country"]}},
        # a non-anonymization classification value must be ignored (VALUES filter)
        {"@id": "ex:other", "rdfs:domain": {"@id": "ex:Demo"},
         "rdfs:range": {"@id": "ex:string"},
         "soya:classification": "tokenization"},
    ],
}


def test_extract_config_full():
    cfg = extract_config(jsonld_to_triple_tuples(CONFIG_DOC))
    attrs = cfg[BASE + "Demo"]
    assert attrs[BASE + "name"].strategy == "masking"
    assert attrs[BASE + "name"].datatype == "string"
    assert attrs[BASE + "gehalt"].strategy == "generalization"
    assert attrs[BASE + "gehalt"].datatype == "integer"
    assert not attrs[BASE + "gehalt"].is_object_generalization
    assert attrs[BASE + "geburtsdatum"].strategy == "randomization"
    ad = attrs[BASE + "adresse"]
    assert ad.is_object_generalization
    assert ad.attr_order == ("city", "state", "country")
    assert BASE + "other" not in attrs  # VALUES filter dropped it


def test_duplicate_property_rejected():
    doc = {
        "@context": CONFIG_DOC["@context"],
        "@graph": [
            {"@id": "ex:overlay", "@type": "soya:OverlayClassification",
             "soya:onBase": [{"@id": "ex:A"}, {"@id": "ex:B"}]},
            {"@id": "ex:name",
             "rdfs:domain": [{"@id": "ex:A"}, {"@id": "ex:B"}],
             "rdfs:range": {"@id": "ex:string"},
             "soya:classification": "masking"},
        ],
    }
    with pytest.raises(OntologyError, match="Duplicate Property"):
        extract_config(jsonld_to_triple_tuples(doc))


def test_demo_config_matches_fixture_semantics():
    from kgforge.config import ANONYMISATION_DEMO, DEMO_PREFIX

    attrs = ANONYMISATION_DEMO[DEMO_PREFIX + "AnonymisationDemo"]
    assert attrs[DEMO_PREFIX + "adresse"].attr_order == ("city", "state", "country")
    assert attrs[DEMO_PREFIX + "longitude"].strategy == "randomization"
