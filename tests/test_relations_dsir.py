"""Unit mirrors for surface-pattern relation extraction (kg/relations.py)
and DSIR importance-resampling selection (datapipe/dsir.py)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from kgforge.datapipe.dsir import (
    MICRO,
    dsir_log_weights,
    dsir_select,
    gumbel_key_micro,
)
from kgforge.kg.relations import (
    DEFAULT_RELATION_PATTERNS,
    extract_relation_candidates,
    relation_support,
    relations_to_triples,
)

_MOD = 2147483647


def _poly(s: str, mult: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % _MOD
    return acc


def _stage2_padded_py(s: str) -> int:
    return _poly(str(_poly(s, 1000003)).rjust(10, "0"), 1009)


_DOCS = [
    (1, "Acme Corp acquired Beta LLC today. Jane Roe, CEO of Acme Corp, spoke."),
    (2, "Beta LLC is based in Vienna Town. Beta LLC is based in Graz City."),
    (3, "nothing capitalized here, and acme corp acquired beta llc stays lower"),
    (4, "Gamma9 Inc was founded by Jane Roe. Gamma9 Inc acquired Acme Corp."),
    (5, ""),
]


def _py_candidates():
    out = []
    for doc_id, text in _DOCS:
        for pred, pat in DEFAULT_RELATION_PATTERNS:
            for m in re.finditer(pat, text):
                out.append((doc_id, pred, m.group(1), m.group(2)))
    return sorted(out)


def test_relation_candidates_match_python_regex_mirror(spark):
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    got = sorted(
        (r["id"], r["pred"], r["subj"], r["obj"])
        for r in extract_relation_candidates(df, "doc_id", "text").collect()
    )
    exp = _py_candidates()
    assert got == exp
    # semantic spot checks: NP stops at punctuation / lowercase, doc 3
    # (lowercase) and doc 5 (empty) contribute nothing
    assert (1, "acquired", "Acme Corp", "Beta LLC") in got
    assert (1, "ceo_of", "Jane Roe", "Acme Corp") in got
    assert (2, "based_in", "Beta LLC", "Vienna Town") in got
    assert (4, "founded_by", "Gamma9 Inc", "Jane Roe") in got
    assert not any(i in (3, 5) for (i, *_rest) in got)
    # doc 2 has TWO based_in matches (multiplicity preserved)
    assert sum(1 for (i, p, *_r) in got if i == 2 and p == "based_in") == 2


def test_relation_support_and_triples(spark):
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    cand = extract_relation_candidates(df, "doc_id", "text")
    sup = {
        (r["pred"], r["subj"], r["obj"]): (r["support"], r["n_docs"])
        for r in relation_support(cand).collect()
    }
    assert sup[("acquired", "Acme Corp", "Beta LLC")] == (1, 1)
    assert sup[("based_in", "Beta LLC", "Vienna Town")] == (1, 1)
    trip = relations_to_triples(relation_support(cand), min_support=1).collect()
    subjects = {r["subject"] for r in trip}
    assert "urn:kgforge:rel:Acme%20Corp" in subjects
    preds = {r["predicate"] for r in trip}
    assert "urn:kgforge:rel:acquired" in preds


def test_relation_candidates_plan_is_jvm_only_single_generate(spark):
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    plan = (
        extract_relation_candidates(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # all patterns ride ONE explode over one projection — one corpus scan
    assert plan.count("Generate explode") == 1


def test_relation_pattern_validation(spark):
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    with pytest.raises(ValueError, match="2 capture groups"):
        extract_relation_candidates(df, "doc_id", "text",
                                    patterns=(("bad", "([A-Z]+)"),))
    with pytest.raises(ValueError, match="escaping"):
        extract_relation_candidates(
            df, "doc_id", "text", patterns=(("bad", r"(\w+) x (\w+)"),))


# ---------------------------------------------------------------- DSIR

_RAW = [
    (10, "quantum flux lattice beam"),
    (11, "pastoral meadow herd graze"),
    (12, "quantum beam quantum beam"),
    (13, ""),
    (14, "Mixed CASE   Quantum Flux"),
]
_TGT = [
    (90, "quantum flux beam"),
    (91, "quantum lattice"),
]
_B = 512
_ALPHA = 1.0


def _py_grams(text: str) -> list[str]:
    toks = [t for t in re.split(r"\s+", text.lower().strip()) if t != ""]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_logw():
    nr: dict[int, int] = {}
    nt: dict[int, int] = {}
    for _i, text in _RAW:
        for g in _py_grams(text):
            b = _stage2_padded_py(g) % _B
            nr[b] = nr.get(b, 0) + 1
    for _i, text in _TGT:
        for g in _py_grams(text):
            b = _stage2_padded_py(g) % _B
            nt[b] = nt.get(b, 0) + 1
    tr, tt = sum(nr.values()), sum(nt.values())

    def lr(b: int) -> int:
        x = math.log((nt.get(b, 0) + _ALPHA) / (tt + _ALPHA * _B)) - math.log(
            (nr.get(b, 0) + _ALPHA) / (tr + _ALPHA * _B)
        )
        return int(round(x * MICRO))

    out = {}
    for i, text in _RAW:
        gs = _py_grams(text)
        out[i] = (len(gs), sum(lr(_stage2_padded_py(g) % _B) for g in gs))
    return out


def test_dsir_log_weights_match_python_mirror(spark):
    raw = spark.createDataFrame(_RAW, "doc_id int, text string")
    tgt = spark.createDataFrame(_TGT, "doc_id int, text string")
    got = {
        r["id"]: (r["n_grams"], r["logw_micro"])
        for r in dsir_log_weights(raw, tgt, "doc_id", "text",
                                  n_buckets=_B, alpha=_ALPHA).collect()
    }
    exp = _py_logw()
    assert got == exp
    # semantics: quantum-heavy docs score above pastoral docs
    assert got[10][1] > got[11][1]
    # empty doc present with zero grams and zero weight
    assert got[13] == (0, 0)


def test_dsir_select_orders_by_gumbel_perturbed_weight(spark):
    raw = spark.createDataFrame(_RAW, "doc_id int, text string")
    tgt = spark.createDataFrame(_TGT, "doc_id int, text string")
    w = dsir_log_weights(raw, tgt, "doc_id", "text", n_buckets=_B)
    sel = dsir_select(w, k=3).collect()
    assert len(sel) == 3
    keys = [r["key_micro"] for r in sel]
    assert keys == sorted(keys, reverse=True)
    # key decomposition is self-consistent: key = logw + gumbel(id)
    gum = {
        r["id"]: r["g"]
        for r in w.select("id", gumbel_key_micro(F.col("id")).alias("g")).collect()
    }
    wmap = {r["id"]: r["logw_micro"] for r in w.collect()}
    for r in sel:
        assert r["key_micro"] == wmap[r["id"]] + gum[r["id"]]
    # deterministic across re-runs
    again = [r["id"] for r in dsir_select(w, k=3).collect()]
    assert again == [r["id"] for r in sel]


def test_dsir_plan_is_jvm_only_and_broadcasts_model(spark):
    raw = spark.createDataFrame(_RAW, "doc_id int, text string")
    tgt = spark.createDataFrame(_TGT, "doc_id int, text string")
    w = dsir_log_weights(raw, tgt, "doc_id", "text", n_buckets=_B)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    sel_plan = (
        dsir_select(w, k=3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in sel_plan
