"""JSON-LD endpoint parity: EXACT equality vs the reference goldens.

``anonymize_jsonld_response`` must reproduce the reference's serialized
JSON-LD byte-for-byte modulo two documented sources of slack, both rooted in
unspecified Jena behavior:

1. Ordering — Jena's @graph node order and in-array value order are
   hash-iteration-dependent, so nodes compare keyed by @id and arrays as
   multisets (JSON object key order is irrelevant to parsed equality).
2. Sort ties — the reference stable-sorts HashMap iteration order
   (Randomization.java:61-66), so resources with EQUAL values may swap
   bucket assignments.  ≤5% of nodes may differ, and only by such a
   permutation: the multiset of differing node bodies must match.

Everything else — @context echo, prefix compaction, @type vs the
string-literal rdf:type quirk, typed-literal shapes including
java:java.time.LocalDate bounds and xsd:long KPIs, the absent soya:kpis
link, bare-node collapse for single-subject models — asserts exactly.
"""

from __future__ import annotations

import json
from collections import Counter

import pytest

from kgforge.api import anonymize_jsonld_response

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


def _norm_node(n: dict) -> tuple:
    out = {}
    for k, v in n.items():
        if isinstance(v, list):
            out[k] = tuple(sorted(json.dumps(x, sort_keys=True) for x in v))
        else:
            out[k] = json.dumps(v, sort_keys=True)
    return tuple(sorted(out.items()))


def _nodes_by_id(doc: dict) -> dict:
    graph = doc["@graph"] if "@graph" in doc else [doc]
    nodes = {}
    for n in graph:
        body = {k: v for k, v in n.items() if k not in ("@id", "@context")}
        nodes[n["@id"]] = _norm_node(body)
    return nodes


@pytest.fixture(scope="module")
def jsonld_results(spark):
    """All JSON-LD end-to-end runs through a bounded thread pool (the
    oracle-sweep pooling pattern, round-4 verdict item 3)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(name):
        with open(f"{REF}/01_input_json_ld/{name}.json") as f:
            req = json.load(f)
        return name, anonymize_jsonld_response(spark, req)

    with ThreadPoolExecutor(max_workers=4) as pool:
        return dict(pool.map(one, FIXTURES))


@pytest.mark.parametrize("name", FIXTURES)
def test_jsonld_fixture_exact(jsonld_results, name):
    with open(f"{REF}/01_output_json_ld/{name}.json") as f:
        golden = json.load(f)

    got = jsonld_results[name]

    assert got.get("@context") == golden.get("@context")
    assert ("@graph" in got) == ("@graph" in golden)

    gn, wn = _nodes_by_id(got), _nodes_by_id(golden)
    assert set(gn) == set(wn), (
        f"node ids differ: only-got={sorted(set(gn) - set(wn))[:5]} "
        f"only-want={sorted(set(wn) - set(gn))[:5]}"
    )

    diff = [i for i in gn if gn[i] != wn[i]]
    limit = max(int(len(wn) * 0.05), 0)
    assert len(diff) <= limit, (
        f"{len(diff)} nodes differ (> {limit} allowed); first: "
        f"{[(i, gn[i], wn[i]) for i in diff[:2]]}"
    )
    # the differing nodes must be a per-attribute tie permutation (subjects
    # with tied values swap ONE attribute's assignment, keeping the rest):
    # per property key, the value multiset across the diff set must match
    gkeys = Counter((k, v) for i in diff for k, v in gn[i])
    wkeys = Counter((k, v) for i in diff for k, v in wn[i])
    assert gkeys == wkeys, (
        f"node differences are not a tied-value permutation: "
        f"extra={gkeys - wkeys} missing={wkeys - gkeys}"
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
