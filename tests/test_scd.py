import pytest

from kgforge.datapipe.scd import scd2_intervals


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k string, ts int, a string, b int")
    got = scd2_intervals(df, "k", "ts", ["a", "b"]).collect()
    return {
        (r["k"], r["a"], r["b"], r["valid_from"], r["valid_to"])
        for r in got
    }


def test_collapse_and_intervals(spark):
    rows = [
        ("u1", 1, "x", 1),
        ("u1", 2, "x", 1),   # unchanged: collapsed
        ("u1", 3, "y", 1),   # attr a changed
        ("u1", 5, "y", 2),   # attr b changed
        ("u2", 4, "z", 9),
    ]
    assert _run(spark, rows) == {
        ("u1", "x", 1, 1, 3),
        ("u1", "y", 1, 3, 5),
        ("u1", "y", 2, 5, None),
        ("u2", "z", 9, 4, None),
    }


def test_value_returns_after_gap_is_new_interval(spark):
    rows = [("u", 1, "x", 1), ("u", 2, "y", 1), ("u", 3, "x", 1)]
    assert _run(spark, rows) == {
        ("u", "x", 1, 1, 2),
        ("u", "y", 1, 2, 3),
        ("u", "x", 1, 3, None),
    }


def test_null_attrs_are_null_safe(spark):
    rows = [("u", 1, None, 1), ("u", 2, None, 1), ("u", 3, "x", 1)]
    assert _run(spark, rows) == {
        ("u", None, 1, 1, 3),
        ("u", "x", 1, 3, None),
    }


def test_empty_attrs_rejected(spark):
    df = spark.createDataFrame([("u", 1, "x", 1)], "k string, ts int, a string, b int")
    with pytest.raises(ValueError):
        scd2_intervals(df, "k", "ts", [])
