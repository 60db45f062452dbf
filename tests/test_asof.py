import pytest

from kgforge.datapipe.asof import asof_join


def _quotes(spark):
    return spark.createDataFrame(
        [("u", 1, 10), ("u", 5, 50), ("u", 5, 60), ("v", 3, 30)],
        "k string, t int, p int",
    )


def _trades(spark):
    return spark.createDataFrame(
        [("u", 0, "a"), ("u", 5, "b"), ("u", 9, "c"), ("w", 2, "d")],
        "k string, t int, tid string",
    )


@pytest.fixture(scope="module")
def results(spark, pool_runner):
    """Each asof_join variant once, concurrently (oracle-sweep pooling
    pattern, round-4 verdict item 3); assertions stay per-test below."""
    import random

    rng = random.Random(7)
    quotes = [(f"k{rng.randrange(5)}", rng.randrange(1000), i) for i in range(300)]
    trades = [(f"k{rng.randrange(7)}", rng.randrange(1000), f"t{i}") for i in range(200)]
    q = spark.createDataFrame(quotes, "k string, t int, p int")
    t = spark.createDataFrame(trades, "k string, t int, tid string")

    return pool_runner({
        "backward": lambda: asof_join(
            _trades(spark), _quotes(spark), "k", "t", ["p"]).collect(),
        "forward": lambda: asof_join(
            _trades(spark), _quotes(spark), "k", "t", ["p"],
            direction="forward").collect(),
        "tolerance": lambda: asof_join(
            _trades(spark), _quotes(spark), "k", "t", ["p"],
            tolerance=2).collect(),
        "part1": lambda: sorted(map(tuple, asof_join(
            t.repartition(1), q.repartition(1), "k", "t", ["p"]).collect())),
        "part16": lambda: sorted(map(tuple, asof_join(
            t.repartition(16), q.repartition(13), "k", "t", ["p"]).collect())),
    })


@pytest.mark.slow
def test_backward_nearest_with_tie_dedup(results):
    got = {r["tid"]: (r["asof_ts"], r["asof_p"]) for r in results["backward"]}
    # DuckDB ASOF mirror: u@0 no quote yet; u@5 matches the (5,60) max-struct
    # survivor; u@9 still 60; w has no quotes
    assert got == {
        "a": (None, None),
        "b": (5, 60),
        "c": (5, 60),
        "d": (None, None),
    }


def test_forward_direction(results):
    got = {r["tid"]: (r["asof_ts"], r["asof_p"]) for r in results["forward"]}
    assert got == {
        "a": (1, 10),
        "b": (5, 60),
        "c": (None, None),
        "d": (None, None),
    }


def test_tolerance_nulls_far_matches(results):
    got = {r["tid"]: (r["asof_ts"], r["asof_p"]) for r in results["tolerance"]}
    # u@9: nearest quote at 5 is 4 ticks away > 2 -> nulled
    assert got["c"] == (None, None) and got["b"] == (5, 60)


def test_left_rows_and_columns_preserved(spark):
    out = asof_join(_trades(spark), _quotes(spark), "k", "t", ["p"])
    assert out.columns == ["k", "t", "tid", "asof_ts", "asof_p"]
    assert out.count() == 4


def test_partition_invariant(results):
    assert results["part1"] == results["part16"]


def test_validates_args(spark):
    t, q = _trades(spark), _quotes(spark)
    with pytest.raises(ValueError):
        asof_join(t, q, "k", "t", [])
    with pytest.raises(ValueError):
        asof_join(t, q, "k", "t", ["p"], direction="sideways")
    with pytest.raises(ValueError):
        asof_join(t, q, "k", "t", ["p"], tolerance=-1)
