"""Python mirror for exact Shapley channel attribution
(datapipe/attribution.py:shapley_attribution)."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import pytest

from kgforge.datapipe.attribution import shapley_attribution

_CHANNELS = ["click", "mail", "search"]

# (user, channel, conv) — conv marked on any row of the user
_TOUCHES = [
    (1, "click", 0), (1, "mail", 0), (1, None, 1),      # {click,mail} conv
    (2, "click", 0), (2, None, 1),                      # {click} conv
    (3, "mail", 0),                                     # {mail} no conv
    (4, "search", 0), (4, "click", 0), (4, "mail", 0), (4, None, 1),
    (5, None, 1),                                       # empty set conv
    (6, "search", 0), (6, None, 1),                     # {search} conv
    (6, "search", 0),                                   # dup touch collapses
]


def _py_shapley(touches, channels):
    n = len(channels)
    sets: dict[int, set] = {}
    conv: dict[int, int] = {}
    for u, c, cv in touches:
        sets.setdefault(u, set())
        if c is not None:
            sets[u].add(c)
        conv[u] = max(conv.get(u, 0), cv)
    v = Counter()
    for u, s in sets.items():
        v[frozenset(s)] += conv[u]
    phi = {c: 0 for c in channels}
    for size in range(n + 1):
        for sub in combinations(channels, size):
            t = frozenset(sub)
            if v[t] == 0:
                continue
            for c in channels:
                if c in t:
                    phi[c] += math.factorial(len(t) - 1) * \
                        math.factorial(n - len(t)) * v[t]
                else:
                    phi[c] -= math.factorial(len(t)) * \
                        math.factorial(n - 1 - len(t)) * v[t]
    return phi, v


def test_shapley_matches_exact_python_mirror(spark):
    df = spark.createDataFrame(_TOUCHES, "u int, ch string, conv int")
    got = {r["channel"]: (r["phi_num"], r["phi_micro"])
           for r in shapley_attribution(df, "u", "ch", "conv",
                                        _CHANNELS).collect()}
    phi, v = _py_shapley(_TOUCHES, _CHANNELS)
    nfact = math.factorial(len(_CHANNELS))
    for c in _CHANNELS:
        assert got[c][0] == phi[c]
    # exact efficiency: sum phi_num = n!(v(full) - v(empty))
    assert sum(p for p, _m in got.values()) == nfact * (
        v[frozenset(_CHANNELS)] - v[frozenset()])
    # click is in three converting coalitions, search in two and it is
    # absent from more converting ones → strictly less credit
    assert got["click"][0] > got["search"][0]


def test_shapley_validates_inputs(spark):
    df = spark.createDataFrame([(1, "a", 0)], "u int, ch string, conv int")
    with pytest.raises(ValueError):
        shapley_attribution(df, "u", "ch", "conv", [])
    with pytest.raises(ValueError):
        shapley_attribution(df, "u", "ch", "conv", ["a", "a"])


def test_shapley_plan_is_jvm_only(spark):
    df = spark.createDataFrame(_TOUCHES, "u int, ch string, conv int")
    plan = (shapley_attribution(df, "u", "ch", "conv", _CHANNELS)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
