import pytest

from kgforge.anonymize.mondrian import mondrian_anonymize, mondrian_ncp


def test_no_generalization_is_zero(spark):
    # k=1: every row is its own region -> zero-width intervals -> NCP 0
    rows = [(i, i, 2 * i) for i in range(8)]
    df = spark.createDataFrame(rows, "id int, a int, b int")
    out = mondrian_anonymize(df, ["a", "b"], 1, "id")
    got = mondrian_ncp(out, ["a", "b"]).collect()[0]
    assert (got["n"], got["ncp"]) == (8, 0.0)


def test_single_region_is_one(spark):
    # k >= n: one region spanning everything -> NCP 1
    rows = [(1, 0, 0), (2, 10, 5), (3, 4, 2)]
    df = spark.createDataFrame(rows, "id int, a int, b int")
    out = mondrian_anonymize(df, ["a", "b"], 5, "id")
    got = mondrian_ncp(out, ["a", "b"]).collect()[0]
    assert (got["n"], got["ncp"]) == (3, 1.0)


def test_mirror_value(spark):
    rows = [(i, (i * 7) % 23, (i * 11) % 19) for i in range(40)]
    df = spark.createDataFrame(rows, "id int, a int, b int")
    out = mondrian_anonymize(df, ["a", "b"], 10, "id")
    rowsx = out.collect()
    d = 2
    n = len(rowsx)
    ga = max(r["a"] for r in rowsx) - min(r["a"] for r in rowsx)
    gb = max(r["b"] for r in rowsx) - min(r["b"] for r in rowsx)
    want = round(
        sum((r["a_hi"] - r["a_lo"]) / ga + (r["b_hi"] - r["b_lo"]) / gb
            for r in rowsx) / (d * n), 6)
    got = mondrian_ncp(out, ["a", "b"]).collect()[0]
    assert got["n"] == n and got["ncp"] == pytest.approx(want, abs=2e-6)
    assert 0.0 < got["ncp"] < 1.0


def test_constant_attribute_contributes_zero(spark):
    rows = [(i, i, 7) for i in range(6)]
    df = spark.createDataFrame(rows, "id int, a int, b int")
    out = mondrian_anonymize(df, ["a", "b"], 3, "id")
    got = mondrian_ncp(out, ["a", "b"]).collect()[0]
    # b is constant: only a's spans count, averaged over d=2
    assert 0.0 < got["ncp"] <= 0.5
    with pytest.raises(ValueError):
        mondrian_ncp(out, [])
