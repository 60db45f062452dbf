"""Round-4 batch 2: Hilbert layout keys, prefix rollup, reciprocity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kgforge.datapipe.layout import hilbert_key_expr, hilbert_layout
from kgforge.datapipe.textstats import prefix_rollup
from kgforge.kg.graphstats import reciprocity


def _xy2d(order, x, y):
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x %= s if s else 1
        y %= s if s else 1
        s //= 2
    return d


def test_hilbert_duckdb_is_true_hilbert():
    bits, n = 4, 16
    expr = hilbert_key_expr("x", "y", bits, dialect="duckdb")
    rows = duckdb.sql(
        f"SELECT x, y, {expr} AS d FROM "
        f"(SELECT a AS x, b AS y FROM generate_series(0, {n-1}) g(a),"
        f" generate_series(0, {n-1}) h(b))"
    ).fetchall()
    pos = {d: (x, y) for x, y, d in rows}
    assert set(pos) == set(range(n * n))  # bijection onto 0..n²-1
    for k in range(1, n * n):  # the Hilbert walk moves one cell at a time
        assert abs(pos[k][0] - pos[k - 1][0]) + abs(pos[k][1] - pos[k - 1][1]) == 1
    assert {(x, y): d for x, y, d in rows} == {
        (x, y): _xy2d(n, x, y) for x in range(n) for y in range(n)
    }


def test_hilbert_spark_matches_python(spark):
    bits, n = 5, 32
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("hx"), (F.col("id") / n).cast("long").alias("hy")
    )
    got = {
        (r["hx"], r["hy"]): r["d"]
        for r in grid.withColumn(
            "d", F.expr(hilbert_key_expr("hx", "hy", bits))
        ).collect()
    }
    assert got == {(x, y): _xy2d(n, x, y) for x in range(n) for y in range(n)}


def test_hilbert_layout_buckets(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 100.0, 100.0), (3, -5.0, 200.0)],
        "id int, x double, y double",
    )
    out = {r["id"]: r for r in hilbert_layout(
        df, "x", "y", (0.0, 100.0), (0.0, 100.0), bits=4).collect()}
    assert out[1]["hx"] == 0 and out[1]["hy"] == 0 and out[1]["hkey"] == 0
    # hi clamps to the last bucket
    assert out[2]["hx"] == 15 and out[2]["hy"] == 15
    assert out[3]["hx"] == 0 and out[3]["hy"] == 15  # clamped both sides
    assert all(0 <= r["hkey"] < 256 for r in out.values())


def test_prefix_rollup_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "a x"), (4, "  ")],
        "id int, p string",
    )
    got = {(r["prefix"], r["depth"]): r["n_rows"]
           for r in prefix_rollup(df, "id", "p", max_depth=2).collect()}
    assert got == {
        ("a", 1): 3,
        ("a b", 2): 2,
        ("a x", 2): 1,
    }


def test_prefix_rollup_regex_special_sep(spark):
    # '.' and '/' are regex metachars — split() must treat them literally
    df = spark.createDataFrame(
        [(1, "com.acme.web"), (2, "com.acme"), (3, "org.x")],
        "id int, p string",
    )
    got = {(r["prefix"], r["depth"]): r["n_rows"]
           for r in prefix_rollup(df, "id", "p", sep=".", max_depth=2).collect()}
    assert got == {
        ("com", 1): 2,
        ("org", 1): 1,
        ("com.acme", 2): 2,
        ("org.x", 2): 1,
    }
    df2 = spark.createDataFrame([(1, "a/b/c")], "id int, p string")
    got2 = {(r["prefix"], r["depth"]): r["n_rows"]
            for r in prefix_rollup(df2, "id", "p", sep="/", max_depth=3).collect()}
    assert got2 == {("a", 1): 1, ("a/b", 2): 1, ("a/b/c", 3): 1}


def test_prefix_rollup_rejects_unsafe_sep(spark):
    df = spark.createDataFrame([(1, "a b")], "id int, p string")
    for bad in ("", "'", "\\"):
        with pytest.raises(ValueError):
            prefix_rollup(df, "id", "p", sep=bad)


def test_reciprocity_hand_case(spark):
    # edges: 1->2, 2->1 (reciprocal pair), 2->3, 3->3 (loop, dropped)
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 3), (1, 2)], "src int, dst int"
    )
    r = reciprocity(df).collect()[0]
    assert (r["n_edges"], r["n_reciprocal"]) == (3, 2)
    assert r["reciprocity_ppm"] == (2 * 1_000_000) // 3
