import pytest

from kgforge.datapipe.profile import cusum_changepoints


def _mirror(rows, slack, threshold):
    by_k = {}
    for k, t, v in rows:
        by_k.setdefault(k, []).append((t, v))
    out = {}
    for k, obs in by_k.items():
        obs.sort()
        n = len(obs)
        total = sum(v for _, v in obs)
        s = 0
        for t, v in obs:
            s = max(0, s + (v * n - total - slack * n))
            out[(k, t)] = (s, s > threshold * n)
    return out


def _run(spark, rows, slack, threshold):
    df = spark.createDataFrame(rows, "k string, ts int, v int")
    got = cusum_changepoints(df, "k", "ts", "v", slack, threshold).collect()
    return {(r["k"], r["ts"]): (r["cusum_scaled"], r["shifted"]) for r in got}


def test_matches_recurrence_mirror(spark):
    rows = (
        [("a", t, 10) for t in range(6)]
        + [("a", t, 25) for t in range(6, 12)]   # upward shift at t=6
        + [("b", t, 5) for t in range(8)]        # flat: never flags
    )
    for slack, h in ((0, 10), (2, 5), (1, 50)):
        assert _run(spark, rows, slack, h) == _mirror(rows, slack, h)


def test_shift_is_detected_and_flat_is_not(spark):
    rows = [("a", t, 10) for t in range(6)] + [
        ("a", t, 30) for t in range(6, 12)
    ]
    got = _run(spark, rows, 0, 20)
    assert any(flag for _, flag in got.values())
    flat = _run(spark, [("b", t, 7) for t in range(10)], 0, 1)
    assert not any(flag for _, flag in flat.values())


def test_reset_after_dip(spark):
    # a deep dip then recovery: max(0, .) must clamp, not go negative
    rows = [("k", 0, 100), ("k", 1, 0), ("k", 2, 0), ("k", 3, 100)]
    got = _run(spark, rows, 0, 1000)
    assert all(c >= 0 for c, _ in got.values())
    assert got == _mirror(rows, 0, 1000)


def test_bad_args(spark):
    df = spark.createDataFrame([("k", 1, 1)], "k string, ts int, v int")
    with pytest.raises(ValueError):
        cusum_changepoints(df, "k", "ts", "v", -1, 5)
    with pytest.raises(ValueError):
        cusum_changepoints(df, "k", "ts", "v", 0, 0)
