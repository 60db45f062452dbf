"""Python mirror tests for truth discovery (kg/fusion.py)."""

from __future__ import annotations

from collections import defaultdict

from kgforge.kg.fusion import MICRO, resolve_conflicts, truth_discovery

# three sources: s_good agrees with s_ok on most facts, s_bad dissents
_ASSERTIONS = [
    ("s_good", "e1", "red"), ("s_ok", "e1", "red"), ("s_bad", "e1", "blue"),
    ("s_good", "e2", "big"), ("s_ok", "e2", "big"), ("s_bad", "e2", "tiny"),
    ("s_good", "e3", "hot"), ("s_ok", "e3", "cold"), ("s_bad", "e3", "cold"),
    ("s_good", "e4", "one"), ("s_bad", "e4", "two"),
    # duplicate assertion must collapse to one vote
    ("s_good", "e1", "red"),
]


def _py_truth(rows, iterations=4):
    claims = sorted(set(rows))
    n_claims = defaultdict(int)
    for s, _k, _v in claims:
        n_claims[s] += 1
    trust = {s: MICRO for s in n_claims}
    conf = {}
    for _ in range(iterations):
        craw, ns = defaultdict(int), defaultdict(int)
        for s, k, v in claims:
            craw[(k, v)] += trust[s]
            ns[(k, v)] += 1
        keysum = defaultdict(int)
        for (k, v), c in craw.items():
            keysum[k] += c
        conf = {
            (k, v): (c * MICRO) // keysum[k] for (k, v), c in craw.items()
        }
        tc = defaultdict(int)
        for s, k, v in claims:
            tc[s] += conf[(k, v)]
        trust = {s: tc[s] // n_claims[s] for s in n_claims}
    return conf, trust, {kv: ns_ for kv, ns_ in ns.items()}


def test_truth_discovery_matches_python_mirror(spark):
    df = spark.createDataFrame(_ASSERTIONS, "source string, k string, value string")
    conf, trust = truth_discovery(df, ["k"], "value", "source", iterations=4)
    got_conf = {
        (r["k"], r["value"]): (r["conf_micro"], r["n_sources"])
        for r in conf.collect()
    }
    got_trust = {
        r["source"]: (r["trust_micro"], r["n_claims"]) for r in trust.collect()
    }
    exp_conf, exp_trust, exp_ns = _py_truth(_ASSERTIONS)
    assert got_conf == {
        kv: (c, exp_ns[kv]) for kv, c in exp_conf.items()
    }
    assert got_trust == {
        s: (t, len([1 for (ss, _k, _v) in set(_ASSERTIONS) if ss == s]))
        for s, t in exp_trust.items()
    }
    # semantics: the dissenting source ends with the lowest trust
    assert got_trust["s_bad"][0] < got_trust["s_good"][0]
    assert got_trust["s_bad"][0] < got_trust["s_ok"][0]


def test_resolve_conflicts_winner_and_tiebreak(spark):
    df = spark.createDataFrame(_ASSERTIONS, "source string, k string, value string")
    conf, _ = truth_discovery(df, ["k"], "value", "source", iterations=4)
    win = {r["k"]: r["value"] for r in resolve_conflicts(conf, ["k"]).collect()}
    # majority + reputation wins e1/e2; e3 has 2-vs-1 for cold
    assert win["e1"] == "red"
    assert win["e2"] == "big"
    assert win["e3"] == "cold"
    # e4: one (more trusted) vs two — s_good outranks s_bad by round 4
    assert win["e4"] == "one"


def test_resolve_conflicts_lexical_tiebreak(spark):
    # two equally-trusted sources, perfectly split key → exact tie
    rows = [("a", "e", "zz"), ("b", "e", "mm")]
    df = spark.createDataFrame(rows, "source string, k string, value string")
    conf, _ = truth_discovery(df, ["k"], "value", "source", iterations=2)
    got = resolve_conflicts(conf, ["k"]).collect()
    assert len(got) == 1 and got[0]["value"] == "mm"


def test_truth_discovery_plan_is_jvm_only(spark):
    df = spark.createDataFrame(_ASSERTIONS, "source string, k string, value string")
    conf, trust = truth_discovery(df, ["k"], "value", "source", iterations=2)
    for d in (conf, trust):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
