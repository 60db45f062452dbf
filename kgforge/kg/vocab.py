"""Closed entity vocabulary for the synthetic interleaved corpus.

Persons / places / orgs with deliberate near-duplicate surface variants (for
MinHash-LSH canonicalization) and a few hot entities at ~100× frequency (for
skew handling).  Pure data — every generator that uses it is a deterministic
function of (seed, doc_id).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Entity:
    eid: str
    etype: str  # Person | Place | Org
    canonical: str
    variants: tuple[str, ...]
    weight: int = 1  # sampling weight; hot entities ≈ 100×


def _e(eid, etype, canonical, variants, weight=1):
    return Entity(eid, etype, canonical, tuple(variants), weight)


ENTITIES: tuple[Entity, ...] = (
    # hot entities (skew drivers)
    _e("p001", "Person", "Alice Muller", ["Alice Muller", "Alice Müller", "A. Muller"], 100),
    _e("l001", "Place", "Vienna", ["Vienna", "Wien", "Vienna Austria"], 100),
    _e("o001", "Org", "Acme Corporation", ["Acme Corporation", "Acme Corp", "ACME"], 100),
    # persons
    _e("p002", "Person", "Benedikt Hofstetter", ["Benedikt Hofstetter", "B. Hofstetter"]),
    _e("p003", "Person", "Nico Beck", ["Nico Beck", "N. Beck"]),
    _e("p004", "Person", "Anna-Lena Grabner", ["Anna-Lena Grabner", "Anna Lena Grabner", "A. Grabner"]),
    _e("p005", "Person", "Hubert Schrittwieser", ["Hubert Schrittwieser", "H. Schrittwieser"]),
    _e("p006", "Person", "Jovana Angerer", ["Jovana Angerer", "J. Angerer"]),
    _e("p007", "Person", "Elsa Hammer", ["Elsa Hammer", "E. Hammer"]),
    _e("p008", "Person", "Mathias Koessler", ["Mathias Koessler", "Mathias Kössler", "M. Koessler"]),
    _e("p009", "Person", "Eduard Schachinger", ["Eduard Schachinger", "E. Schachinger"]),
    _e("p010", "Person", "Marijana Ringhofer", ["Marijana Ringhofer", "M. Ringhofer"]),
    # places
    _e("l002", "Place", "Graz", ["Graz", "Graz Styria"]),
    _e("l003", "Place", "Linz", ["Linz", "Linz an der Donau"]),
    _e("l004", "Place", "Salzburg", ["Salzburg", "Salzburg City"]),
    _e("l005", "Place", "Innsbruck", ["Innsbruck", "Innsbruck Tirol"]),
    _e("l006", "Place", "Berlin", ["Berlin", "Berlin Germany"]),
    _e("l007", "Place", "Munich", ["Munich", "Muenchen", "München"]),
    _e("l008", "Place", "Zurich", ["Zurich", "Zuerich", "Zürich"]),
    # orgs
    _e("o002", "Org", "OwnYourData Foundation", ["OwnYourData Foundation", "OwnYourData", "OYD Foundation"]),
    _e("o003", "Org", "Datentreuhand GmbH", ["Datentreuhand GmbH", "Datentreuhand"]),
    _e("o004", "Org", "Semantic Web Company", ["Semantic Web Company", "SWC"]),
    _e("o005", "Org", "Alpine Analytics AG", ["Alpine Analytics AG", "Alpine Analytics"]),
    _e("o006", "Org", "Blue Danube Bank", ["Blue Danube Bank", "BD Bank"]),
)

SURFACE_TO_EID: dict[str, str] = {}
for _ent in ENTITIES:
    for _v in _ent.variants:
        SURFACE_TO_EID[_v.lower()] = _ent.eid

EID_TO_ENTITY: dict[str, Entity] = {e.eid: e for e in ENTITIES}

# weighted sampling table (index by h % len)
WEIGHTED_EIDS: list[str] = []
for _ent in ENTITIES:
    WEIGHTED_EIDS.extend([_ent.eid] * _ent.weight)

ALL_SURFACES: list[str] = sorted(SURFACE_TO_EID)

FILLER_WORDS = (
    "yesterday today reportedly announced visited met with signed the a new "
    "quarterly report partnership agreement during conference in near at "
    "pipeline dataset model cluster storage query engine release"
).split()

KG = "http://kgforge.dev/ns/"
ENT_NS = "http://kgforge.dev/entity/"
DOC_NS = "http://kgforge.dev/doc/"
