"""URL canonicalization + dedup vs hand goldens."""

from __future__ import annotations

import pytest

from kgforge.datapipe.scrub import canonicalize_url, url_dedup

CASES = [
    # (raw, canonical)
    ("https://WWW.Example.COM:443/Path/x?utm_source=a&id=7&fbclid=z#frag",
     "https://www.example.com/Path/x?id=7"),
    ("http://example.com:80/?utm_campaign=a",
     "http://example.com/"),
    ("HTTP://EXAMPLE.com/a%20b",
     "http://example.com/a%20b"),
    ("https://example.com",
     "https://example.com/"),
    ("https://example.com:8443/x",            # non-default port kept
     "https://example.com:8443/x"),
    ("https://example.com/x?b=2&a=1",         # param order preserved
     "https://example.com/x?b=2&a=1"),
    ("https://example.com/x?ref=nav&a=1&mc_cid=7",
     "https://example.com/x?a=1"),
    ("https://example.com/x?utm_source=a&utm_medium=b",
     "https://example.com/x"),
]


def test_canonical_goldens(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in CASES]


def test_url_dedup_groups(spark):
    rows = [
        (1, "https://Example.com:443/p?utm_source=x"),
        (2, "https://example.com/p"),
        (3, "https://example.com/p?id=1"),
    ]
    df = spark.createDataFrame(rows, "id bigint, url string")
    got = {
        r["canonical"]: (r["n_urls"], r["n_raw_forms"], r["keep_id"])
        for r in url_dedup(df, "id", "url").collect()
    }
    assert got["https://example.com/p"] == (2, 2, 1)
    assert got["https://example.com/p?id=1"] == (1, 1, 3)


def test_plan_is_jvm_only(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "https://a.b/c")], "id bigint, url string")
    plan = url_dedup(df, "id", "url")._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
