import pytest

from kgforge.datapipe.sketch import kmv_jaccard_pairs, kmv_sketch


def test_exact_below_k(spark):
    rows = [("g", f"v{i % 10}") for i in range(100)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = kmv_sketch(df, ["g"], "v", k=64).collect()[0]
    assert got["present"] == 10
    assert got["est_distinct"] == 10.0
    assert got["sketch"] == sorted(got["sketch"]) and len(got["sketch"]) == 10


def test_estimate_within_envelope_at_k(spark):
    n_true = 2000
    rows = [("g", f"value-{i}") for i in range(n_true)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = kmv_sketch(df, ["g"], "v", k=128).collect()[0]
    assert got["present"] == 128
    # KMV relative error ~1/sqrt(k-1) ≈ 9%; allow 3 sigma
    assert abs(got["est_distinct"] - n_true) / n_true < 0.27


def test_jaccard_estimate(spark):
    # A = 0..999, B = 500..1499: true Jaccard = 500/1500 = 1/3
    rows = [("A", f"x{i}") for i in range(1000)] + [
        ("B", f"x{i}") for i in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch(df, ["g"], "v", k=256)
    got = kmv_jaccard_pairs(sk, "g", k=256).collect()[0]
    assert (got["g_a"], got["g_b"]) == ("A", "B")
    assert abs(got["jaccard_est"] - 1 / 3) < 0.12


def test_identical_groups_jaccard_one(spark):
    rows = [(g, f"v{i}") for g in ("A", "B") for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch(df, ["g"], "v", k=64)
    got = kmv_jaccard_pairs(sk, "g", k=64).collect()[0]
    assert got["jaccard_est"] == 1.0


def test_k_validation(spark):
    df = spark.createDataFrame([("g", "v")], "g string, v string")
    with pytest.raises(ValueError):
        kmv_sketch(df, ["g"], "v", k=1)
