"""HITS vs the numpy mirror + structural goldens."""

from __future__ import annotations

import random

import pytest

from kgforge.kg.hits import _driver_hits, hits


def _collect(df):
    return sorted((r["node"], r["hub"], r["auth"]) for r in df.collect())


def test_star_hub_and_authority(spark):
    # one source pointing at many sinks: the source is the pure hub,
    # sinks split the authority evenly
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = dict((n, (h, a)) for n, h, a in _collect(hits(df, iterations=3)))
    assert got[0][0] == pytest.approx(1.0)
    assert got[0][1] == pytest.approx(0.0)
    for i in range(1, 6):
        assert got[i][0] == pytest.approx(0.0)
        assert got[i][1] == pytest.approx(0.2)


def test_matches_numpy_mirror(spark):
    rnd = random.Random(41)
    edges = sorted({(rnd.randrange(30), rnd.randrange(30)) for _ in range(150)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _collect(hits(df, iterations=5))
    want = _driver_hits(edges, 5)
    assert [n for n, _, _ in got] == [n for n, _, _ in want]
    for (_, gh, ga), (_, wh, wa) in zip(got, want):
        assert gh == pytest.approx(wh, abs=1e-12)
        assert ga == pytest.approx(wa, abs=1e-12)


def test_driver_path_agrees_with_distributed(spark):
    rnd = random.Random(43)
    edges = sorted({(rnd.randrange(25), rnd.randrange(25)) for _ in range(90)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    fast = _collect(hits(df, iterations=4, driver_threshold=10**6))
    slow = _collect(hits(df, iterations=4))
    assert [n for n, _, _ in fast] == [n for n, _, _ in slow]
    for (_, fh, fa), (_, sh, sa) in zip(fast, slow):
        assert fh == pytest.approx(sh, abs=1e-12)
        assert fa == pytest.approx(sa, abs=1e-12)


def test_mass_conservation(spark):
    rnd = random.Random(47)
    edges = sorted({(rnd.randrange(20), rnd.randrange(20)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = _collect(hits(df, iterations=2))
    assert sum(h for _, h, _ in rows) == pytest.approx(1.0)
    assert sum(a for _, _, a in rows) == pytest.approx(1.0)
