import math

import pytest

from kgforge.datapipe.profile import histogram_quantiles


def _mirror(vals, lo, hi, bins, qs):
    width = (hi - lo) / bins
    counts = {}
    for v in vals:
        b = min(max(math.floor((v - lo) / width), 0), bins - 1)
        counts[b] = counts.get(b, 0) + 1
    n = len(vals)
    out = {}
    for q in qs:
        qn = q * n
        cum = 0
        for b in sorted(counts):
            prev, cum = cum, cum + counts[b]
            if prev < qn <= cum:
                e = lo + width * (b + (qn - prev) / counts[b])
                out[q] = math.floor(e * 1e6) / 1e6
                break
    return n, out


def test_histogram_quantiles_global_mirror(spark):
    vals = [float((7 * i) % 103) for i in range(500)] + [-5.0, 250.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["q"]: (r["n"], r["est"])
        for r in histogram_quantiles(df, "x", 0.0, 103.0, bins=64).collect()
    }
    n, want = _mirror(vals, 0.0, 103.0, 64, (0.5, 0.9, 0.99))
    assert set(got) == set(want)
    for q, e in want.items():
        assert got[q][0] == n
        assert got[q][1] == pytest.approx(e, abs=1e-9), q


def test_histogram_quantiles_grouped_exactly_one_row_per_q(spark):
    rows = [(g, float(i % (10 * (g + 1)))) for g in range(3) for i in range(200)]
    df = spark.createDataFrame(rows, "g int, x double")
    out = histogram_quantiles(
        df, "x", 0.0, 30.0, group_cols=["g"], bins=30, qs=(0.25, 0.5, 0.75)
    ).collect()
    assert len(out) == 9  # 3 groups x 3 quantiles
    # group medians scale with the group's value range
    med = {r["g"]: r["est"] for r in out if r["q"] == 0.5}
    assert med[0] < med[1] < med[2]


def test_histogram_merge_equals_direct(spark):
    # union-mergeability: hist(A ∪ B) quantiles == quantiles over unioned data
    a = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    b = spark.createDataFrame([(float(i),) for i in range(100, 300)], "x double")
    direct = {
        r["q"]: r["est"]
        for r in histogram_quantiles(
            a.unionByName(b), "x", 0.0, 300.0, bins=50
        ).collect()
    }
    _, want = _mirror(
        [float(i) for i in range(300)], 0.0, 300.0, 50, (0.5, 0.9, 0.99)
    )
    for q, e in want.items():
        assert direct[q] == pytest.approx(e, abs=1e-9)
