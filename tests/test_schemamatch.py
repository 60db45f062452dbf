"""Unit tests for instance-based schema matching (datapipe/schemamatch.py)."""

from __future__ import annotations

from kgforge.datapipe.schemamatch import (
    best_column_match,
    match_columns,
    melt_columns,
)


def test_melt_columns_one_row_per_nonnull_value(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "k int, s string")
    got = sorted((r["col"], r["val"])
                 for r in melt_columns(df, "t", ["k", "s"]).collect())
    assert got == [("t.k", "1"), ("t.k", "2"), ("t.k", "3"),
                   ("t.s", "x"), ("t.s", "y")]


def test_match_columns_finds_shared_key(spark):
    a = spark.createDataFrame(
        [(i, f"name{i}", i % 3) for i in range(50)],
        "cust_id int, cust_name string, region int",
    )
    b = spark.createDataFrame(
        [(1000 + i, i % 50, "S" if i % 2 else "N") for i in range(120)],
        "order_id int, customer int, status string",
    )
    m = match_columns(a, "cust", ["cust_id", "cust_name", "region"],
                      b, "ord", ["order_id", "customer", "status"])
    rows = {(r["col_a"], r["col_b"]): r["jaccard_est"] for r in m.collect()}
    # every pair oriented (cust.*, ord.*)
    assert all(ca.startswith("cust.") and cb.startswith("ord.")
               for ca, cb in rows)
    best = {r["col_a"]: (r["col_b"], r["jaccard_est"])
            for r in best_column_match(m).collect()}
    # the planted FK: cust_id values 0..49 == ord.customer values 0..49
    assert best["cust.cust_id"][0] == "ord.customer"
    assert best["cust.cust_id"][1] > 0.9
    # region (0,1,2) ⊂ customer values → its best is also ord.customer,
    # but with a small score; names match nothing
    assert best["cust.cust_name"][1] == 0.0


def test_best_column_match_deterministic_tiebreak(spark):
    a = spark.createDataFrame([(1,), (2,)], "x int")
    b = spark.createDataFrame([(1, 1), (2, 2)], "p int, q int")
    m = match_columns(a, "ta", ["x"], b, "tb", ["p", "q"])
    best = best_column_match(m).collect()
    # p and q have identical value sets → exact tie → smallest col_b wins
    assert len(best) == 1 and best[0]["col_b"] == "tb.p"


def test_schemamatch_plan_is_jvm_only(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([(1,)], "p int")
    m = match_columns(a, "ta", ["x"], b, "tb", ["p"])
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
