import math
from collections import Counter

import pytest

from kgforge.datapipe.textstats import collocations_pmi


def _mirror(texts, min_count):
    uni, big = Counter(), Counter()
    for t in texts:
        toks = t.strip().lower().split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    nu = sum(uni.values())
    nb = sum(c for c in big.values() if True)
    out = {}
    for (a, b), c in big.items():
        if c < min_count:
            continue
        pmi = math.log(c * nu * nu / (uni[a] * uni[b] * nb))
        npmi = None if c == nb else pmi / math.log(nb / c)
        out[(a, b)] = (
            uni[a], uni[b], c, round(pmi, 6),
            None if npmi is None else round(npmi, 6),
        )
    return out


def test_collocations_pmi_mirror(spark):
    texts = [
        "new york is a big city",
        "new york city has a big port",
        "a big dog and a small dog",
        "york new city",
        "the city of new york",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["w1"], r["w2"]): (r["n1"], r["n2"], r["n12"], r["pmi"], r["npmi"])
        for r in collocations_pmi(df, "text", min_count=2).collect()
    }
    want = _mirror(texts, 2)
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k][:3] == w[:3], k
        assert got[k][3] == pytest.approx(w[3], abs=1e-6), k
        if w[4] is None:
            assert got[k][4] is None
        else:
            assert got[k][4] == pytest.approx(w[4], abs=1e-6), k
    # "new york" must be the strongest collocation in this corpus
    assert max(want, key=lambda k: want[k][3]) in got


def test_collocations_single_bigram_corpus_null_npmi(spark):
    # one distinct bigram: n12 == nb makes the npmi denominator ln(1) = 0
    df = spark.createDataFrame([("alpha beta",), ("alpha beta",)], "text string")
    rows = collocations_pmi(df, "text", min_count=1).collect()
    assert len(rows) == 1 and rows[0]["npmi"] is None
