import pytest

from kgforge.anonymize.privacy import rank_swap


def _mirror(values, block):
    """Python mirror: sort, reverse within blocks, map back by rank."""
    order = sorted(range(len(values)), key=lambda i: (values[i], i))
    n = len(values)
    swapped = {}
    for r, i in enumerate(order):
        lo = (r // block) * block
        hi = min(lo + block - 1, n - 1)
        swapped[i] = values[order[lo + hi - r]]
    return swapped


def _run(spark, values, block):
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id int, v int")
    out = rank_swap(df, "v", block, "id", out="sw")
    return {r["id"]: (r["v"], r["sw"]) for r in out.collect()}


CASES = {
    "mirror": ([50, 10, 40, 20, 30, 60, 5], 3),
    "marginal": ([9, 1, 7, 7, 3, 5, 2], 4),
    "identity": ([4, 2, 9], 1),
    "partial": ([1, 2, 3, 4, 5], 3),
}


@pytest.fixture(scope="module")
def swaps(spark, pool_runner):
    """Each rank_swap case once, concurrently (oracle-sweep pooling
    pattern, round-4 verdict item 3); assertions stay per-test below."""
    return pool_runner({
        k: (lambda v=v, b=b: _run(spark, v, b)) for k, (v, b) in CASES.items()
    })


def test_block_reversal_matches_mirror(swaps):
    values, block = CASES["mirror"]
    got = swaps["mirror"]
    want = _mirror(values, block)
    assert {i: sw for i, (_, sw) in got.items()} == want


def test_marginal_distribution_preserved(swaps):
    values, _ = CASES["marginal"]
    got = swaps["marginal"]
    assert sorted(sw for _, sw in got.values()) == sorted(values)


def test_block_one_is_identity(swaps):
    got = swaps["identity"]
    assert all(v == sw for v, sw in got.values())


def test_partial_last_block_reverses_within_itself(swaps):
    # n=5, block=3: ranks {0,1,2} reverse, ranks {3,4} reverse as a pair
    got = swaps["partial"]
    assert {i: sw for i, (_, sw) in got.items()} == {
        0: 3, 1: 2, 2: 1, 3: 5, 4: 4,
    }


def test_bad_block_rejected(spark):
    df = spark.createDataFrame([(1, 1)], "id int, v int")
    with pytest.raises(ValueError):
        rank_swap(df, "v", 0, "id")
