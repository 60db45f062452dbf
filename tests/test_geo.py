import math
import random

import pytest

from kgforge.datapipe.geo import nearest_neighbor, planar_radius_join


def _brute(pts, r):
    out = set()
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1:]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r * r:
                a, b = sorted((ia, ib))
                out.add((a, b, d2))
    return out


def test_matches_brute_force_with_negatives(spark):
    rng = random.Random(42)
    pts = [(i, rng.randrange(-500, 500), rng.randrange(-500, 500))
           for i in range(120)]
    df = spark.createDataFrame(pts, "id int, x int, y int")
    got = {(r["a"], r["b"], r["dist2"])
           for r in planar_radius_join(df, "id", "x", "y", 60).collect()}
    assert got == _brute(pts, 60)
    assert got  # non-vacuous


def test_boundary_inclusive(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 3, 4), (3, 6, 8)], "id int, x int, y int"
    )
    got = {(r["a"], r["b"], r["dist2"])
           for r in planar_radius_join(df, "id", "x", "y", 5).collect()}
    # 3-4-5 triangles: dist 5 exactly -> included; (1,3) at dist 10 -> out
    assert got == {(1, 2, 25), (2, 3, 25)}


def test_cross_cell_pairs_found(spark):
    # points straddling a cell boundary at distance < r but different cells
    df = spark.createDataFrame(
        [(1, 99, 0), (2, 101, 0)], "id int, x int, y int"
    )
    got = planar_radius_join(df, "id", "x", "y", 100).collect()
    assert [(r["a"], r["b"], r["dist2"]) for r in got] == [(1, 2, 4)]


def test_nearest_neighbor_ties_and_range(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 10, 0), (3, -10, 0), (4, 1000, 1000)],
        "id int, x int, y int",
    )
    got = {r["id"]: (r["nn_id"], r["dist2"])
           for r in nearest_neighbor(df, "id", "x", "y", 50).collect()}
    # 1 is equidistant from 2 and 3 -> smaller id wins
    assert got[1] == (2, 100)
    assert got[2] == (1, 100) and got[3] == (1, 100)
    assert 4 not in got  # out of range of everything


def test_partition_invariant(spark):
    rng = random.Random(9)
    pts = [(i, rng.randrange(0, 2000), rng.randrange(0, 2000)) for i in range(300)]
    df = spark.createDataFrame(pts, "id int, x int, y int")
    a = sorted(map(tuple, planar_radius_join(df.repartition(1), "id", "x", "y", 80).collect()))
    b = sorted(map(tuple, planar_radius_join(df.repartition(16), "id", "x", "y", 80).collect()))
    assert a == b


def test_validates_radius(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id int, x int, y int")
    with pytest.raises(ValueError):
        planar_radius_join(df, "id", "x", "y", 0)
