import pytest
from pyspark.sql import functions as F

from kgforge.anonymize.lattice import full_domain_generalize, lattice_order


def test_lattice_order():
    assert lattice_order([3, 2]) == [
        (0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1),
    ]


def _hier():
    bal = F.col("bal")
    return {
        "bal": [
            (F.floor(bal / 10) * 10).cast("bigint"),
            (F.floor(bal / 50) * 50).cast("bigint"),
            F.lit("*"),
        ],
        "seg": [F.col("seg"), F.lit("*")],
    }


def test_picks_minimal_satisfying_vector(spark):
    # 7 rows in decade 0 + 33 in decade 10, all inside one 50-bucket:
    # (0,0) fails (decade-0 group of 7 < 8), (0,1) fails (still 7), and
    # (1,0) is the first passing vector (floor-50 groups of 23/17)
    rows = [(5, "A")] * 7 + [(15, "A")] * 16 + [(15, "B")] * 17
    df = spark.createDataFrame(rows, "bal int, seg string")
    levels, groups = full_domain_generalize(df, _hier(), k=8)
    assert levels == {"bal": 1, "seg": 0}
    got = {(r["bal_g"], r["seg_g"]): r["n"] for r in groups.collect()}
    assert sum(got.values()) == 40
    assert min(got.values()) >= 8


def test_suppression_fallback_and_failure(spark):
    rows = [(i * 97, "S") for i in range(12)]  # all distinct, one segment
    df = spark.createDataFrame(rows, "bal int, seg string")
    levels, groups = full_domain_generalize(df, _hier(), k=12)
    assert levels == {"bal": 2, "seg": 0}  # ('*', seg) reaches 12 first
    assert [r["n"] for r in groups.collect()] == [12]
    with pytest.raises(ValueError):
        full_domain_generalize(df, _hier(), k=13)


def test_every_group_reaches_k(spark):
    import random

    rng = random.Random(9)
    rows = [(rng.randrange(0, 300), ["A", "B", "C"][rng.randrange(3)])
            for _ in range(200)]
    df = spark.createDataFrame(rows, "bal int, seg string")
    levels, groups = full_domain_generalize(df, _hier(), k=15)
    assert min(r["n"] for r in groups.collect()) >= 15
    # monotonicity sanity: the vector one step FINER on bal must fail
    # (otherwise the search would have stopped earlier)
    if levels["bal"] > 0:
        finer = dict(_hier())
        vec = dict(levels)
        vec["bal"] -= 1
        exprs = [finer[c][vec[c]].cast("string").alias(c) for c in finer]
        g = df.select(*exprs).groupBy("bal", "seg").count()
        # the finer vector has SOME group below k OR a later lex position
        mins = g.agg(F.min("count").alias("m")).collect()[0]["m"]
        if sum(vec.values()) < sum(levels.values()):
            assert mins < 15
