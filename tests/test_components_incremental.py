import random

from kgforge.kg.components import (
    connected_components,
    incremental_components,
    union_find_components,
)


def _lab(df):
    return {r["node"]: r["comp"] for r in df.collect()}


def test_incremental_equals_full_rebuild(spark):
    rng = random.Random(12)
    old = sorted({tuple(sorted(rng.sample(range(60), 2))) for _ in range(50)})
    new = sorted({tuple(sorted(rng.sample(range(80), 2))) for _ in range(25)})
    old_df = spark.createDataFrame(old, "a int, b int")
    new_df = spark.createDataFrame(new, "a int, b int")
    base = connected_components(old_df)
    got = _lab(incremental_components(base, new_df))
    want = _lab(connected_components(old_df.unionByName(new_df)))
    assert got == want
    # and the python mirror agrees
    assert got == union_find_components(old + new)


def test_merge_two_components_keeps_min_anchor(spark):
    old_df = spark.createDataFrame([(1, 2), (10, 11)], "a int, b int")
    base = connected_components(old_df)
    bridge = spark.createDataFrame([(2, 10)], "a int, b int")
    got = _lab(incremental_components(base, bridge))
    assert got == {1: 1, 2: 1, 10: 1, 11: 1}


def test_brand_new_nodes_only_in_delta(spark):
    base = connected_components(spark.createDataFrame([(1, 2)], "a int, b int"))
    delta = spark.createDataFrame([(100, 101)], "a int, b int")
    got = _lab(incremental_components(base, delta))
    assert got == {1: 1, 2: 1, 100: 100, 101: 100}
