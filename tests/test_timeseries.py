import pytest

from kgforge.datapipe.timeseries import fill_gaps


def _run(spark, rows, step=1):
    df = spark.createDataFrame(rows, "k string, ts int, v int")
    out = fill_gaps(df, "k", "ts", ["v"], step=step)
    return {(r["k"], r["ts"], r["is_observed"], r["v"]) for r in out.collect()}


def test_gaps_filled_forward(spark):
    rows = [("a", 1, 10), ("a", 4, 40), ("b", 2, 5)]
    assert _run(spark, rows) == {
        ("a", 1, True, 10),
        ("a", 2, False, 10),
        ("a", 3, False, 10),
        ("a", 4, True, 40),
        ("b", 2, True, 5),
    }


def test_observed_null_value_carries_previous(spark):
    rows = [("a", 1, 7), ("a", 2, None), ("a", 3, 9)]
    got = _run(spark, rows)
    # tick 2 is observed but its null value forward-fills from tick 1
    assert ("a", 2, True, 7) in got and ("a", 3, True, 9) in got


def test_step_grid(spark):
    rows = [("a", 0, 1), ("a", 6, 2)]
    assert _run(spark, rows, step=3) == {
        ("a", 0, True, 1),
        ("a", 3, False, 1),
        ("a", 6, True, 2),
    }


def test_single_observation_key(spark):
    assert _run(spark, [("z", 5, 3)]) == {("z", 5, True, 3)}


def test_bad_args(spark):
    df = spark.createDataFrame([("a", 1, 1)], "k string, ts int, v int")
    with pytest.raises(ValueError):
        fill_gaps(df, "k", "ts", ["v"], step=0)
    with pytest.raises(ValueError):
        fill_gaps(df, "k", "ts", [])
