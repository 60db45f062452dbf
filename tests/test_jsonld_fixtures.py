"""JSON-LD endpoint parity: triple-set P/R vs the reference goldens.

The reference pytest asserts byte-equality of Jena's JSON-LD serialization;
we compare at the triple level instead (same information, serializer-
independent): parse the golden output with our own normalizer and require
P/R ≥ 0.95 on (subj, pred, obj_value) — dtype tags excluded because Jena
types KPI ints as xsd:long and bucket bounds as java:* classes.

Tie-order caveat as in test_flat_fixtures (multisets invariant).
"""

from __future__ import annotations

import json

import pytest

from kgforge.api import anonymize_jsonld
from kgforge.ingest import jsonld_to_triple_tuples

REF = "/root/reference/pytest"

FIXTURES = [
    "11-maksing",
    "12-generalization",
    "13-generalization-address",
    "14-randomization",
    "15-multiple-attributes",
    "16-multiple-objects",
    "17-use-original-attributes",
]


def _triple_set(tuples):
    return {(s, p, v) for s, p, v, _dt, _iri in tuples}


@pytest.mark.parametrize("name", FIXTURES)
def test_jsonld_fixture(spark, name):
    with open(f"{REF}/01_input_json_ld/{name}.json") as f:
        req = json.load(f)
    with open(f"{REF}/01_output_json_ld/{name}.json") as f:
        golden = json.load(f)

    got_df, _report = anonymize_jsonld(spark, req)
    got = {
        (r["subj"], r["pred"], r["obj_value"])
        for r in got_df.select("subj", "pred", "obj_value").collect()
    }
    want = _triple_set(jsonld_to_triple_tuples(golden))

    # blank-node ids are generator-local on both sides: compare bnode triples
    # by (pred, value) multiset, IRI-subject triples exactly
    got_iri = {t for t in got if not t[0].startswith("_:")}
    want_iri = {t for t in want if not t[0].startswith("_:")}

    inter = got_iri & want_iri
    precision = len(inter) / len(got_iri) if got_iri else 1.0
    recall = len(inter) / len(want_iri) if want_iri else 1.0
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.4f} R={recall:.4f}\n"
        f"sample only-got: {sorted(got_iri - want_iri)[:5]}\n"
        f"sample only-want: {sorted(want_iri - got_iri)[:5]}"
    )

    from collections import Counter

    got_bn = Counter((p, v) for s, p, v in got if s.startswith("_:"))
    want_bn = Counter((p, v) for s, p, v in want if s.startswith("_:"))
    assert got_bn == want_bn, (
        f"bnode triples differ: extra={got_bn - want_bn} missing={want_bn - got_bn}"
    )


def test_jsonld_lines_distributed_matches_driver(spark):
    """The distributed JSONL ingest produces the same triples as the
    driver-side normalizer for every JSON-LD fixture (modulo the per-line
    blank-node uniquification tag, which we strip for comparison)."""
    import json as _json

    from kgforge.ingest import jsonld_lines_to_triples, jsonld_to_triples

    for name in ("11-maksing", "12-generalization", "14-randomization"):
        with open(f"{REF}/01_input_json_ld/{name}.json") as f:
            req = _json.load(f)
        doc = req["data"]
        a = {
            tuple(r)
            for r in jsonld_to_triples(spark, doc).collect()
        }
        lines = spark.createDataFrame(
            [( _json.dumps(doc),)], "value string"
        ).repartition(2)
        strip = lambda x: x.split(".")[0] if isinstance(x, str) and x.startswith("_:") else x
        b = {
            (strip(r["subj"]), r["pred"], strip(r["obj_value"]), r["obj_dtype"], r["obj_is_iri"])
            for r in jsonld_lines_to_triples(lines).collect()
        }
        assert a == b, f"{name}: {sorted(a - b)[:3]} / {sorted(b - a)[:3]}"
