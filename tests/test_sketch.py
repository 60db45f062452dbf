import pytest
from pyspark.sql import functions as F

from kgforge.datapipe.sketch import (
    cms_build,
    cms_error_bound,
    cms_heavy_hitters,
    hll_distinct,
)


def _users(g, n):
    return [(g, f"user_{g}_{i}") for i in range(n)]


def test_hll_accuracy_and_dup_invariance(spark):
    rows = _users("a", 100) + _users("b", 1000) + _users("c", 3000)
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: r["est"] for r in hll_distinct(df, ["g"], "v", p=9).collect()}
    for g, n in (("a", 100), ("b", 1000), ("c", 3000)):
        assert abs(got[g] - n) / n < 0.12, (g, got[g])
    # multiplicity must not move the registers: same values twice = same est
    doubled = spark.createDataFrame(rows + rows, "g string, v string")
    got2 = {r["g"]: r["est"] for r in hll_distinct(doubled, ["g"], "v", p=9).collect()}
    assert got == got2


def test_hll_present_bounded_by_m(spark):
    df = spark.createDataFrame(_users("x", 50000), "g string, v string")
    r = hll_distinct(df, ["g"], "v", p=7).collect()[0]
    assert r["present"] <= 128
    assert abs(r["est"] - 50000) / 50000 < 0.3  # p=7: ~9% stderr, 3 sigma


def test_hll_p_range_rejected(spark):
    df = spark.createDataFrame([("a", "b")], "g string, v string")
    with pytest.raises(ValueError):
        hll_distinct(df, ["g"], "v", p=4)


def test_cms_superset_and_one_sided(spark):
    # skewed: "hot_i" appears 200+10*i times, 400 singletons as noise
    rows = []
    for i in range(5):
        rows += [(f"hot_{i}",)] * (200 + 10 * i)
    rows += [(f"cold_{j}",) for j in range(400)]
    df = spark.createDataFrame(rows, "v string")
    true = {f"hot_{i}": 200 + 10 * i for i in range(5)}
    got = {r["value"]: r["est"] for r in cms_heavy_hitters(df, "v", 100).collect()}
    for v, c in true.items():
        assert v in got  # no false negatives above threshold
        assert got[v] >= c  # one-sided
        assert got[v] - c <= 3 * cms_error_bound(4, 512, len(rows))


def test_cms_registers_merge(spark):
    rows = [(f"v_{i % 37}",) for i in range(500)]
    df = spark.createDataFrame(rows, "v string")
    full = cms_build(df, "v")
    h1 = cms_build(spark.createDataFrame(rows[:250], "v string"), "v")
    h2 = cms_build(spark.createDataFrame(rows[250:], "v string"), "v")
    merged = (
        h1.unionByName(h2)
        .groupBy("lane", "slot")
        .agg(F.sum("c").alias("c"))
    )
    a = {(r["lane"], r["slot"]): r["c"] for r in full.collect()}
    b = {(r["lane"], r["slot"]): r["c"] for r in merged.collect()}
    assert a == b
