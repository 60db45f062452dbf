"""Unit mirrors for k_map (anonymize/privacy.py) and assign_split
(datapipe/mix.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.anonymize.privacy import k_map
from kgforge.datapipe.mix import assign_split

_MOD = 2147483647


def _poly(s: str, mult: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % _MOD
    return acc


def _stage2_padded_py(s: str) -> int:
    return _poly(str(_poly(s, 1000003)).rjust(10, "0"), 1009)


def test_k_map_counts_and_risk(spark):
    pop = spark.createDataFrame(
        [(1, "x")] * 10 + [(1, "y")] * 3 + [(2, "x")] * 1 + [(None, "x")] * 4,
        "nat int, seg string",
    )
    # sample: subset of population plus one group absent from it
    samp = spark.createDataFrame(
        [(1, "x")] * 2 + [(2, "x")] * 1 + [(None, "x")] * 2 + [(9, "z")] * 1,
        "nat int, seg string",
    )
    got = {
        (r["nat"], r["seg"]): (r["n_sample"], r["n_population"], r["at_risk"])
        for r in k_map(samp, pop, ["nat", "seg"], k=5).collect()
    }
    assert got[(1, "x")] == (2, 10, False)
    assert got[(2, "x")] == (1, 1, True)
    # NULL QI group must match its own population group (null-safe join)
    assert got[(None, "x")] == (2, 4, True)
    # sample group absent from population counts 0 and is at risk
    assert got[(9, "z")] == (1, 0, True)
    assert len(got) == 4


def test_assign_split_matches_python_mirror_and_is_partition_invariant(spark):
    ids = [(f"doc-{i:05d}",) for i in range(3000)]
    df = spark.createDataFrame(ids, "id string")
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    got = {r["id"]: r["split"] for r in assign_split(df, "id", splits).collect()}

    def mirror(s: str) -> str:
        b = _stage2_padded_py(s) % 10000
        if b < 8000:
            return "train"
        if b < 9000:
            return "val"
        return "test"

    assert all(got[i] == mirror(i) for (i,) in ids)
    # repartitioning never moves a row between splits
    got2 = {
        r["id"]: r["split"]
        for r in assign_split(df.repartition(13), "id", splits).collect()
    }
    assert got == got2
    # realized fractions near targets
    n_train = sum(1 for v in got.values() if v == "train")
    assert abs(n_train / 3000 - 0.8) < 0.03


def test_assign_split_rejects_bad_fractions(spark):
    df = spark.createDataFrame([("a",)], "id string")
    try:
        assign_split(df, "id", [("train", 0.5), ("test", 0.4)])
    except ValueError:
        pass
    else:
        raise AssertionError("fractions not summing to 1 must raise")


def test_kmap_split_plans_are_jvm_only(spark):
    pop = spark.createDataFrame([(1, "x")] * 4, "nat int, seg string")
    samp = spark.createDataFrame([(1, "x")] * 2, "nat int, seg string")
    for out in (
        k_map(samp, pop, ["nat", "seg"]),
        assign_split(spark.createDataFrame([("a",)], "id string"), "id"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
