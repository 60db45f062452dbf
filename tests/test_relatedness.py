"""Python mirror for co-mention PMI relatedness (kg/relatedness.py)."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

from kgforge.kg.relatedness import MICRO, comention_pmi

_MENTIONS = [
    (1, "acme"), (1, "vienna"), (1, "acme"),      # dup mention collapses
    (2, "acme"), (2, "vienna"), (2, "graz"),
    (3, "acme"), (3, "graz"),
    (4, "vienna"),
    (5, "acme"), (5, "vienna"),
]


def _py_pmi(rows):
    docs: dict[int, set] = {}
    for d, e in rows:
        docs.setdefault(d, set()).add(e)
    n = len(docs)
    ce = Counter(e for s in docs.values() for e in s)
    cab = Counter()
    for s in docs.values():
        for a, b in combinations(sorted(s), 2):
            cab[(a, b)] += 1
    out = {}
    for (a, b), c in cab.items():
        pmi = round(math.log((c * n) / (ce[a] * ce[b])) * MICRO)
        out[(a, b)] = (ce[a], ce[b], c, pmi)
    return out


def test_comention_pmi_matches_python_mirror(spark):
    df = spark.createDataFrame(_MENTIONS, "doc_id int, surface string")
    got = {
        (r["a"], r["b"]): (r["c_a"], r["c_b"], r["c_ab"], r["pmi_micro"])
        for r in comention_pmi(df).collect()
    }
    assert got == _py_pmi(_MENTIONS)
    # acme+vienna co-occur 3/5 docs yet both are frequent → PMI below the
    # rarer, perfectly-associated acme+graz pair
    assert got[("acme", "vienna")][3] < got[("acme", "graz")][3]


def test_comention_pmi_min_pairs_filter(spark):
    df = spark.createDataFrame(_MENTIONS, "doc_id int, surface string")
    got = {(r["a"], r["b"]) for r in comention_pmi(df, min_pairs=2).collect()}
    assert got == {("acme", "vienna"), ("acme", "graz")}
    got3 = {(r["a"], r["b"]) for r in comention_pmi(df, min_pairs=3).collect()}
    assert got3 == {("acme", "vienna")}


def test_comention_pmi_plan_is_jvm_only(spark):
    df = spark.createDataFrame(_MENTIONS, "doc_id int, surface string")
    plan = comention_pmi(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
