import random

from pyspark.sql import functions as F

from kgforge.datapipe.sketch import (
    hll_distinct,
    hll_estimate_registers,
    hll_merge_registers,
    hll_registers,
)


def _est(df):
    return {tuple(r[:-2]) if len(r) > 2 else r[0]: (r["present"], round(r["est"], 6))
            for r in df.collect()}


def test_merged_registers_equal_direct_sketch(spark):
    rng = random.Random(6)
    rows = [(f"s{rng.randrange(4)}", f"u{rng.randrange(500)}")
            for _ in range(3000)]
    df = spark.createDataFrame(rows, "grp string, user string")
    regs = hll_registers(df, ["grp"], "user", p=8)
    merged = hll_merge_registers(
        regs.select(F.lit("ALL").alias("grp"), "_bucket", "_r"), ["grp"]
    )
    via_merge = _est(hll_estimate_registers(merged, ["grp"], p=8))
    direct = _est(
        hll_distinct(df.select(F.lit("ALL").alias("grp"), "user"),
                     ["grp"], "user", p=8)
    )
    assert via_merge == direct  # merge is EXACTLY the whole-table sketch


def test_hll_distinct_unchanged_by_refactor(spark):
    # the decomposed path must reproduce the one-shot estimator
    rows = [(f"g{i % 3}", f"v{i % 97}") for i in range(1000)]
    df = spark.createDataFrame(rows, "grp string, v string")
    a = _est(hll_distinct(df, ["grp"], "v", p=9))
    b = _est(hll_estimate_registers(
        hll_registers(df, ["grp"], "v", p=9), ["grp"], p=9))
    assert a == b
    # and the estimate is in a sane band around the truth (97 per group)
    for _, est in a.values():
        assert 70 <= est <= 130
