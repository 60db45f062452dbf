import pytest

from kgforge.datapipe.survivorship import golden_records


def _df(spark):
    return spark.createDataFrame(
        [
            ("c1", 5, "alice", "NY"),
            ("c1", 9, "alexandra", "SF"),
            ("c1", 7, "al", None),
            ("c2", 1, None, "LA"),
        ],
        "cl string, bal int, name string, city string",
    )


def test_rules(spark):
    out = golden_records(
        _df(spark),
        "cl",
        [("bal", "max"), ("name", "longest"), ("city", "shortest")],
    ).collect()
    got = {r["cluster"]: (r["n_members"], r["bal"], r["name"], r["city"])
           for r in out}
    assert got["c1"] == (3, 9, "alexandra", "NY")
    assert got["c2"] == (1, 1, None, "LA")


def test_shortest_ignores_nulls_and_ties_on_value(spark):
    df = spark.createDataFrame(
        [("c", "bb"), ("c", None), ("c", "aa")], "cl string, v string"
    )
    out = golden_records(df, "cl", [("v", "shortest")]).collect()[0]
    assert out["v"] == "aa"  # tie on length -> smaller value


def test_min_rule_and_validation(spark):
    df = _df(spark)
    out = golden_records(df, "cl", [("bal", "min")]).collect()
    assert {r["cluster"]: r["bal"] for r in out} == {"c1": 5, "c2": 1}
    with pytest.raises(ValueError):
        golden_records(df, "cl", [])
    with pytest.raises(ValueError):
        golden_records(df, "cl", [("bal", "mode")])
