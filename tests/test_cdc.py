import pytest

from kgforge.datapipe.cdc import apply_changes


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k int, name string, bal int",
    )


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k int, name string, bal int, seq int, op string")


def _run(spark, rows):
    out = apply_changes(_base(spark), _chg(spark, rows), ["k"], "seq")
    return {(r["k"], r["name"], r["bal"]) for r in out.collect()}


def test_latest_change_wins(spark):
    rows = [
        (1, "a1", 11, 1, "U"),
        (1, "a2", 12, 2, "U"),   # later seq wins
        (2, "b9", 99, 5, "U"),
    ]
    assert _run(spark, rows) == {(1, "a2", 12), (2, "b9", 99), (3, "c", 30)}


def test_delete_then_reinsert_order(spark):
    rows = [
        (2, "b", 20, 1, "D"),
        (2, "B", 21, 2, "I"),    # re-insert after delete: survives
        (3, "c", 30, 7, "D"),    # final delete: gone
        (3, "C", 31, 6, "U"),    # earlier update loses to the delete
    ]
    assert _run(spark, rows) == {(1, "a", 10), (2, "B", 21)}


def test_insert_new_key(spark):
    rows = [(9, "z", 90, 1, "I")]
    assert _run(spark, rows) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (9, "z", 90),
    }


def test_untouched_base_passthrough_and_empty_changes(spark):
    out = apply_changes(_base(spark), _chg(spark, []), ["k"], "seq")
    assert {(r["k"], r["name"], r["bal"]) for r in out.collect()} == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30),
    }


def test_unknown_op_raises_at_action(spark):
    df = apply_changes(_base(spark), _chg(spark, [(1, "a", 1, 1, "X")]), ["k"], "seq")
    with pytest.raises(Exception, match="unknown op"):
        df.collect()


def test_missing_columns_rejected(spark):
    chg = spark.createDataFrame([(1, 5, 1, "U")], "k int, bal int, seq int, op string")
    with pytest.raises(ValueError, match="missing base columns"):
        apply_changes(_base(spark), chg, ["k"], "seq")
