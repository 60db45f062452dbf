import random

import pytest

from kgforge.anonymize.privacy import microaggregate


def _mirror(rows, k):
    """(id, value) -> {id: (centroid, n, gid)} under the fixed-k
    contiguous-group contract with remainder absorbed into the last
    group."""
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    n_groups = max(len(srt) // k, 1)
    out = {}
    groups = {}
    for i, (rid, v) in enumerate(srt):
        gid = min(i // k, n_groups - 1)
        groups.setdefault(gid, []).append((rid, v))
    for gid, members in groups.items():
        c = sum(v for _, v in members) / len(members)
        for rid, _ in members:
            out[rid] = (c, len(members), gid)
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "id string, v double")
    got = microaggregate(df, "v", k, "id").collect()
    return {
        r["id"]: (r["_centroid"], r["_centroid_n"], r["_centroid_gid"])
        for r in got
    }


def test_matches_mirror_with_remainder(spark):
    rng = random.Random(3)
    rows = [(f"r{i:03d}", float(rng.randrange(100))) for i in range(47)]
    got = _run(spark, rows, 5)
    want = _mirror(rows, 5)
    assert set(got) == set(want)
    for rid in want:
        assert got[rid][1:] == want[rid][1:]
        assert got[rid][0] == pytest.approx(want[rid][0], abs=1e-9)


def test_group_sizes_between_k_and_2k_minus_1(spark):
    rows = [(f"r{i:03d}", float(i)) for i in range(23)]
    got = _run(spark, rows, 10)
    sizes = {gid: n for _, (_, n, gid) in got.items()}
    assert sizes == {0: 10, 1: 13}  # remainder 3 absorbed, never a tiny group


def test_fewer_rows_than_k_is_one_group(spark):
    rows = [("a", 1.0), ("b", 5.0)]
    got = _run(spark, rows, 10)
    assert got == {"a": (3.0, 2, 0), "b": (3.0, 2, 0)}


def test_ties_split_deterministically_by_id(spark):
    rows = [(f"r{i}", 7.0) for i in range(6)]
    got = _run(spark, rows, 3)
    want = _mirror(rows, 3)
    assert {r: g[2] for r, g in got.items()} == {
        r: g[2] for r, g in want.items()
    }


def test_k_below_one_rejected(spark):
    df = spark.createDataFrame([("a", 1.0)], "id string, v double")
    with pytest.raises(ValueError):
        microaggregate(df, "v", 0, "id")
