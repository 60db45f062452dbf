"""Unit tests for the pure-SQL Jaro-Winkler scorer and blocked join."""

from __future__ import annotations

from kgforge.datapipe.jaro import (
    MAX_LEN,
    jaro_winkler_join,
    with_jaro_winkler,
)


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "i int, ta string, tb string")


def _jw(spark, s1, s2):
    df = _pairs_df(spark, [(0, s1, s2)])
    return with_jaro_winkler(df, "ta", "tb").collect()[0].jw


def test_jw_textbook_values(spark):
    df = _pairs_df(
        spark,
        [
            (1, "martha", "marhta"),
            (2, "dixon", "dicksonx"),
            (3, "dwayne", "duane"),
            (4, "abc", "abc"),
            (5, "abc", "xyz"),
        ],
    )
    got = {r.i: round(r.jw, 6) for r in with_jaro_winkler(df, "ta", "tb").collect()}
    assert got[1] == 0.961111
    assert got[2] == 0.813333
    assert got[3] == 0.84
    assert got[4] == 1.0
    assert got[5] == 0.0


def test_jw_no_boost_below_threshold(spark):
    # common prefix 'a' but jaro < 0.7 -> Winkler boost suppressed
    # (expectation written with the implementation's own float association)
    assert _jw(spark, "axxxx", "ayyyy") == (1 / 5 + 1 / 5 + 1.0) / 3


def test_jw_empty_strings(spark):
    assert _jw(spark, "", "") == 0.0
    assert _jw(spark, "a", "") == 0.0


def test_jw_cap_at_max_len(spark):
    # identical after the cap -> 1.0 even though the raw tails differ
    s1 = "x" * MAX_LEN + "aaa"
    s2 = "x" * MAX_LEN + "bbb"
    assert _jw(spark, s1, s2) == 1.0


def test_jw_join_blocks_and_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "jonathan", "g1"),
            (2, "jonathon", "g1"),
            (3, "zzzz", "g1"),
            (4, "jonathan", "g2"),  # same name, other block: no pair
        ],
        "pid int, name string, blk string",
    )
    got = {
        (r.id_a, r.id_b): r.jw
        for r in jaro_winkler_join(df, "pid", "name", "blk", 0.86).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] > 0.9


def test_jw_rejects_non_identifier_columns(spark):
    import pytest

    df = spark.createDataFrame([(1, "a", "b")], "i int, ta string, tb string")
    with pytest.raises(ValueError):
        with_jaro_winkler(df, "ta; drop", "tb")
