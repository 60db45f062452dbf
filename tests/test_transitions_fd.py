import pytest

from kgforge.datapipe.profile import fd_violations


def test_fd_violations_found(spark):
    rows = [
        (1, "A", "x"), (1, "A", "x"),      # duplicate, not a violation
        (2, "B", "y"), (2, "B", "z"),      # violation: B -> {y, z}
        (3, "C", "w"),
    ]
    df = spark.createDataFrame(rows, "row int, k string, v string")
    got = fd_violations(df, ["k"], "v").collect()
    assert {(r["row"], r["k"], r["v"], r["n_rhs"]) for r in got} == {
        (2, "B", "y", 2), (2, "B", "z", 2),
    }


def test_fd_clean_table_empty(spark):
    df = spark.createDataFrame([(1, "A", "x"), (2, "A", "x")],
                               "row int, k string, v string")
    assert fd_violations(df, ["k"], "v").count() == 0
    with pytest.raises(ValueError):
        fd_violations(df, [], "v")
