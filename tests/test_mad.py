import pytest

from kgforge.datapipe.profile import mad_outliers


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def _mirror(rows, k):
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = {}
    for g, vals in by_g.items():
        med = _lower_median(vals)
        mad = _lower_median([abs(v - med) for v in vals])
        for v in vals:
            out.setdefault(g, set()).add((v, med, mad, abs(v - med) > k * mad))
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "g string, v int")
    got = mad_outliers(df, ["g"], "v", k=k).collect()
    out = {}
    for r in got:
        out.setdefault(r["g"], set()).add(
            (r["v"], r["_median"], r["_mad"], r["is_outlier"])
        )
    return out


def test_matches_python_mirror(spark):
    rows = [("a", v) for v in [1, 2, 2, 3, 100]] + [
        ("b", v) for v in [10, 20, 30, 40]
    ]
    for k in (1, 3, 5):
        assert _run(spark, rows, k) == _mirror(rows, k)


def test_outlier_flagging(spark):
    rows = [("g", v) for v in [5, 6, 7, 8, 1000]]
    got = _run(spark, rows, 5)["g"]
    flagged = {v for v, _, _, o in got if o}
    assert flagged == {1000}


def test_zero_mad_constant_group(spark):
    rows = [("c", 4), ("c", 4), ("c", 4)]
    got = _run(spark, rows, 5)["c"]
    assert got == {(4, 4, 0, False)}


def test_even_count_uses_lower_median(spark):
    rows = [("e", 1), ("e", 2), ("e", 3), ("e", 4)]
    got = _run(spark, rows, 100)["e"]
    meds = {m for _, m, _, _ in got}
    assert meds == {2}  # lower median, not 2.5


def test_bad_args(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(ValueError):
        mad_outliers(df, [], "v")
    with pytest.raises(ValueError):
        mad_outliers(df, ["g"], "v", k=-1)
