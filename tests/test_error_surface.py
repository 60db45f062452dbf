"""S6 error surface: the reference's error fixtures mapped to typed
exceptions (GlobalExceptionHandler.java:25-93 returns 400/404 ProblemDetail;
this library raises instead — same trigger conditions, same messages where
the fixture asserts them).

Case 05 (invalid prefix) is NOT an error in the reference: the flat ingest
mints resource IRIs as prefix+object<i> without validating the prefix, the
pivot then matches nothing, and the response is an empty data list with
k-Anonymity 1 — we preserve that quirk.
"""

from __future__ import annotations

import json

import pytest

from kgforge.api import anonymize_flat_json

REF = "/root/reference/pytest/02_input_flat_json"


def _load(name):
    with open(f"{REF}/{name}.json") as f:
        return json.load(f)


def test_missing_configuration_url_raises(spark):
    # 01: DTO validation — configurationUrl is mandatory
    req = _load("01-missing-parameter")
    assert "configurationUrl" not in req
    with pytest.raises(ValueError, match="configuration"):
        anonymize_flat_json(spark, req)


def test_unknown_configuration_url_raises(spark):
    # 02: ontology fetch failure → typed error naming the URL
    req = _load("02-invalid-url")
    with pytest.raises(ValueError, match="invalidURL"):
        anonymize_flat_json(spark, req)


def test_invalid_prefix_yields_empty_output(spark):
    # 05: reference quirk — not an error; empty data + k-Anonymity 1
    req = _load("05-invalid-prefix")
    want = json.load(
        open("/root/reference/pytest/02_output_flat_json/05-invalid-prefix.json")
    )
    got = anonymize_flat_json(spark, req)
    assert got == want
