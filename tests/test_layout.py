import random

import pytest

from pyspark.sql import functions as F

from kgforge.datapipe.layout import (
    zorder_layout,
    zorder_skip_stats,
    zorder_value,
)


def _spread_py(x):
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _z_py(x, y, xb, yb):
    def scale(v, lo, hi):
        v = min(max(float(v), lo), hi)
        return min(int((v - lo) / (hi - lo) * 65536), 65535)

    return _spread_py(scale(x, *xb)) | (_spread_py(scale(y, *yb)) << 1)


def test_zorder_value_matches_python_mirror(spark):
    rng = random.Random(5)
    rows = [
        (i, rng.randrange(0, 1024), rng.uniform(0.0, 4096.0))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, x long, y double")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id",
            zorder_value(
                F.col("x"), F.col("y"), (0.0, 1024.0), (0.0, 4096.0)
            ).alias("z"),
        ).collect()
    }
    for i, x, y in rows:
        assert got[i] == _z_py(x, y, (0.0, 1024.0), (0.0, 4096.0))


def test_out_of_bounds_clamp_into_edge_cells(spark):
    df = spark.createDataFrame(
        [(1, -50, -1.0), (2, 99999, 99999.0)], "id int, x long, y double"
    )
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id",
            zorder_value(
                F.col("x"), F.col("y"), (0.0, 1024.0), (0.0, 4096.0)
            ).alias("z"),
        ).collect()
    }
    assert got[1] == 0
    assert got[2] == _spread_py(65535) | (_spread_py(65535) << 1)


def test_layout_clusters_both_dimensions(spark):
    # uniform points: after z-layout every bucket covers a small
    # rectangle in BOTH dims; a sort-by-x layout leaves y unclustered
    rng = random.Random(9)
    rows = [
        (i, rng.randrange(0, 65536), float(rng.randrange(0, 65536)))
        for i in range(4096)
    ]
    df = spark.createDataFrame(rows, "id int, x long, y double")
    laid = zorder_layout(
        df, "x", "y", (0.0, 65536.0), (0.0, 65536.0), n_buckets=64
    )
    stats = zorder_skip_stats(laid, "_zbucket", ["x", "y"]).collect()
    assert sum(r["n"] for r in stats) == 4096
    for r in stats:
        assert r["x_max"] - r["x_min"] < 65536 * 0.30
        assert r["y_max"] - r["y_min"] < 65536 * 0.30


def test_bad_bounds_and_buckets_rejected(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "id int, x long, y double")
    with pytest.raises(ValueError):
        df.select(zorder_value(F.col("x"), F.col("y"), (5.0, 5.0), (0, 1)))
    with pytest.raises(ValueError):
        zorder_layout(df, "x", "y", (0, 1), (0, 1), n_buckets=0)


def _compaction_py(rows, target):
    """(part, file_id, size) -> {(part, file_id): (rewrite, bin_id)}."""
    out = {}
    parts = {}
    for p, f, s in rows:
        parts.setdefault(p, []).append((f, s))
    for p, files in parts.items():
        small = sorted(
            [(f, s) for f, s in files if s < target],
            key=lambda t: (-t[1], t[0]),
        )
        fill = 0
        for f, s in small:
            out[(p, f)] = (True, fill // target)
            fill += s
        for f, s in files:
            if s >= target:
                out[(p, f)] = (False, -1)
    return out


def test_compaction_plan_matches_python_mirror(spark):
    from kgforge.datapipe.layout import compaction_plan

    rng = random.Random(11)
    target = 1000
    rows = [
        (f"p{rng.randrange(3)}", i, rng.randrange(1, 2500))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "part string, file_id long, size long")
    got = {
        (r["part"], r["file_id"]): (r["rewrite"], r["bin_id"])
        for r in compaction_plan(df, "part", "file_id", "size", target).collect()
    }
    assert got == _compaction_py(rows, target)


def test_compaction_plan_bins_bounded_and_dense(spark):
    from kgforge.datapipe.layout import compaction_plan

    rng = random.Random(12)
    target = 1000
    rows = [("p", i, rng.randrange(1, 1000)) for i in range(500)]
    df = spark.createDataFrame(rows, "part string, file_id long, size long")
    plan = compaction_plan(df, "part", "file_id", "size", target).collect()
    bins = {}
    for r in plan:
        assert r["rewrite"] is True
        bins.setdefault(r["bin_id"], []).append(r["size"])
    # dense ids from 0
    assert sorted(bins) == list(range(len(bins)))
    # cumulative-fill bound: every bin's total is within one file of the
    # target (the previous bin's closing file sets how far a bin can start
    # past its boundary, so the global max is the tight witness)
    gmax = max(s for _, _, s in rows)
    for b, sizes in bins.items():
        assert sum(sizes) < target + gmax
        if b < len(bins) - 1:
            assert sum(sizes) > target - gmax
