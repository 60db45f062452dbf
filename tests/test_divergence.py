import math

import pytest

from kgforge.datapipe.mix import source_divergence


def _mirror(docs, alpha=0.5):
    cs, call = {}, {}
    for src, text in docs:
        for tok in text.lower().split():
            cs[(src, tok)] = cs.get((src, tok), 0) + 1
            call[tok] = call.get(tok, 0) + 1
    v = len(call)
    n_all = sum(call.values())
    srcs = {s for s, _ in cs}
    out = {}
    for s in srcs:
        n_s = sum(c for (s2, _), c in cs.items() if s2 == s)
        kl = js = 0.0
        for tok, c_all in call.items():
            c_s = cs.get((s, tok), 0)
            p = (c_s + alpha) / (n_s + alpha * v)
            q = (c_all + alpha) / (n_all + alpha * v)
            m = (p + q) / 2
            kl += p * math.log(p / q)
            js += (p * math.log(p / m) + q * math.log(q / m)) / 2
        out[s] = (n_s, kl, js)
    return out


def test_divergence_mirror_and_properties(spark):
    docs = [
        ("a", "cat dog cat bird"),
        ("a", "cat cat fish"),
        ("b", "dog dog dog wolf wolf"),
        ("c", "cat dog bird fish wolf"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        r["source"]: (r["n_tokens"], r["kl"], r["js"])
        for r in source_divergence(df).collect()
    }
    want = _mirror(docs)
    assert set(got) == set(want)
    for s, (n, kl, js) in want.items():
        gn, gkl, gjs = got[s]
        assert gn == n
        assert gkl == pytest.approx(kl, abs=1e-9)
        assert gjs == pytest.approx(js, abs=1e-9)
        assert gkl >= -1e-12 and gjs >= -1e-12  # divergences are nonnegative
        assert gjs <= math.log(2) + 1e-12
    # the off-distribution source must score highest on both
    assert got["b"][1] == max(g[1] for g in got.values())
