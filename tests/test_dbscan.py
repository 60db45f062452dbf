import random

import pytest

from kgforge.datapipe.clustering import dbscan_grid


def _dbscan_py(pts, eps, min_pts):
    """Brute-force DBSCAN with the same deterministic label rules:
    cluster = min core id of the component, border attaches to the min
    label among its core neighbors."""
    P = {i: (x, y) for i, x, y in pts}

    def nb(i):
        xi, yi = P[i]
        return [
            j for j in P
            if j != i and (xi - P[j][0]) ** 2 + (yi - P[j][1]) ** 2
            <= eps * eps
        ]

    cores = {i for i in P if len(nb(i)) + 1 >= min_pts}
    parent = {i: i for i in cores}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for i in cores:
        for j in nb(i):
            if j in cores:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    lbl = {i: find(i) for i in cores}
    out = {}
    for i in P:
        if i in cores:
            out[i] = ("core", lbl[i])
        else:
            cn = [lbl[j] for j in nb(i) if j in cores]
            out[i] = ("border", min(cn)) if cn else ("noise", None)
    return out


def _run(spark, pts, eps, min_pts):
    df = spark.createDataFrame(pts, "id long, x double, y double")
    return {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_grid(df, "id", "x", "y", eps, min_pts).collect()
    }


def test_dbscan_roles_and_labels_crafted(spark):
    pts = [
        # dense cluster A: 5 mutual cores
        (1, 0.0, 0.0), (2, 0.5, 0.0), (3, 0.0, 0.5), (4, 0.5, 0.5),
        (5, 0.25, 0.25),
        # border: within eps of core 2 only (1 neighbor + self < min_pts)
        (6, 1.4, 0.0),
        # noise: alone
        (7, 5.0, 5.0),
        # dense cluster B: 4 mutual cores
        (8, 10.0, 10.0), (9, 10.4, 10.0), (10, 10.0, 10.4),
        (11, 10.4, 10.4),
    ]
    got = _run(spark, pts, eps=1.0, min_pts=4)
    assert got == {
        1: ("core", 1), 2: ("core", 1), 3: ("core", 1), 4: ("core", 1),
        5: ("core", 1), 6: ("border", 1), 7: ("noise", None),
        8: ("core", 8), 9: ("core", 8), 10: ("core", 8), 11: ("core", 8),
    }
    assert got == _dbscan_py(pts, 1.0, 4)


@pytest.mark.parametrize("seed", [2, 6])
@pytest.mark.slow
def test_dbscan_matches_bruteforce_random(spark, seed):
    rng = random.Random(seed)
    pts = [
        (i, rng.uniform(0.0, 4.0), rng.uniform(0.0, 4.0)) for i in range(60)
    ]
    got = _run(spark, pts, eps=0.7, min_pts=3)
    assert got == _dbscan_py(pts, 0.7, 3)


def test_dbscan_min_pts_one_everything_core(spark):
    pts = [(1, 0.0, 0.0), (2, 9.0, 9.0)]
    got = _run(spark, pts, eps=1.0, min_pts=1)
    assert got == {1: ("core", 1), 2: ("core", 2)}


def test_dbscan_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    with pytest.raises(ValueError):
        dbscan_grid(df, "id", "x", "y", 0.0, 3)
    with pytest.raises(ValueError):
        dbscan_grid(df, "id", "x", "y", 1.0, 0)
