import pytest

from kgforge.datapipe.attribution import touch_attribution


def _run(spark, rows, lookback=10):
    df = spark.createDataFrame(rows, "u string, ts long, t string")
    out = touch_attribution(
        df, "u", "ts", "t", ["view", "click"], "buy", lookback
    )
    return {
        (r["user"], r["conv_ts"]): (
            r["first_touch_type"], r["first_touch_ts"],
            r["last_touch_type"], r["last_touch_ts"], r["n_touches"],
        )
        for r in out.collect()
    }


def test_first_and_last_touch(spark):
    rows = [
        ("u", 1, "view"), ("u", 3, "click"), ("u", 5, "view"), ("u", 8, "buy"),
    ]
    assert _run(spark, rows) == {
        ("u", 8): ("view", 1, "view", 5, 3),
    }


def test_lookback_excludes_stale_touches(spark):
    rows = [("u", 1, "view"), ("u", 50, "click"), ("u", 55, "buy")]
    assert _run(spark, rows, lookback=10) == {
        ("u", 55): ("click", 50, "click", 50, 1),
    }


def test_conversion_itself_and_later_touches_excluded(spark):
    rows = [("u", 5, "buy"), ("u", 6, "click")]
    assert _run(spark, rows) == {("u", 5): (None, None, None, None, 0)}


def test_other_conversions_are_not_touches(spark):
    rows = [("u", 1, "buy"), ("u", 3, "click"), ("u", 5, "buy")]
    assert _run(spark, rows) == {
        ("u", 1): (None, None, None, None, 0),
        ("u", 5): ("click", 3, "click", 3, 1),
    }


def test_users_isolated(spark):
    rows = [("a", 1, "view"), ("b", 2, "buy")]
    assert _run(spark, rows) == {("b", 2): (None, None, None, None, 0)}


def test_bad_args(spark):
    df = spark.createDataFrame([("u", 1, "buy")], "u string, ts long, t string")
    with pytest.raises(ValueError):
        touch_attribution(df, "u", "ts", "t", [], "buy", 10)
    with pytest.raises(ValueError):
        touch_attribution(df, "u", "ts", "t", ["view"], "buy", 0)
