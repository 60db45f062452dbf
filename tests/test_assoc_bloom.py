import itertools

import pytest

from kgforge.datapipe.assoc import association_rules
from kgforge.datapipe.sketch import bloom_build, bloom_probe


def _mirror_rules(rows):
    baskets = {}
    for bk, it in rows:
        baskets.setdefault(bk, set()).add(it)
    n = len(baskets)
    items = {}
    for s in baskets.values():
        for it in s:
            items[it] = items.get(it, 0) + 1
    out = {}
    for s in baskets.values():
        for a, b in itertools.combinations(sorted(s), 2):
            out[(a, b)] = out.get((a, b), 0) + 1
    return {
        (a, b): (
            items[a], items[b], c,
            c / n, c / items[a], c / items[b],
            (c * n) / (items[a] * items[b]),
        )
        for (a, b), c in out.items()
    }


def test_association_rules_mirror(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "d"), (4, "b"),  # duplicate item in basket: ignored
        (5, "a"),
    ]
    df = spark.createDataFrame(rows, "bk bigint, item string")
    got = {
        (r["a"], r["b"]): (
            r["n_a"], r["n_b"], r["n_ab"],
            r["support"], r["conf_ab"], r["conf_ba"], r["lift"],
        )
        for r in association_rules(df, "bk", "item").collect()
    }
    want = _mirror_rules(rows)
    assert set(got) == set(want)
    for k, w in want.items():
        for gx, wx in zip(got[k], w):
            assert gx == pytest.approx(wx, abs=1e-12), k


def test_association_max_basket_cap(spark):
    rows = [(1, x) for x in "abcde"] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "bk bigint, item string")
    got = association_rules(df, "bk", "item", max_basket=3).collect()
    # the 5-item hub basket is dropped entirely; only (a,b) from basket 2
    assert {(r["a"], r["b"]) for r in got} == {("a", "b")}
    # N counts only surviving baskets
    assert got[0]["support"] == pytest.approx(1.0)


def test_bloom_no_false_negatives_and_low_fp(spark):
    members = [(f"member_{i}",) for i in range(300)]
    others = [(f"other_{i}",) for i in range(1000)]
    mdf = spark.createDataFrame(members, "v string")
    odf = spark.createDataFrame(others, "v string")
    bloom = bloom_build(mdf, "v", m_bits=4096, depth=4)
    inres = {r["value"]: r["in_bloom"] for r in bloom_probe(bloom, mdf, "v").collect()}
    assert all(inres.values())  # zero false negatives, guaranteed
    out = {r["value"]: r["in_bloom"] for r in bloom_probe(bloom, odf, "v").collect()}
    fp = sum(out.values()) / len(out)
    assert fp < 0.05  # theory ~0.6% at n=300, m=4096, k=4


@pytest.mark.slow
def test_bloom_union_merge(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "v string")
    both = a.unionByName(b)
    merged = bloom_build(a, "v").unionByName(bloom_build(b, "v")).distinct()
    direct = bloom_build(both, "v")
    assert {r["slot"] for r in merged.collect()} == {
        r["slot"] for r in direct.collect()
    }
