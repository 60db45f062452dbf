"""Distributed Lloyd's k-means vs the python mirror."""

from __future__ import annotations

import random

import pytest

from kgforge.datapipe.clustering import _py_kmeans, kmeans_lloyd


def _mkdata(seed, n=60, d=4, spread=0.15):
    rnd = random.Random(seed)
    centers = [[rnd.uniform(-1, 1) for _ in range(d)] for _ in range(3)]
    rows = []
    for i in range(n):
        c = centers[i % 3]
        rows.append(
            (i, [round(x + rnd.uniform(-spread, spread), 4) for x in c])
        )
    return rows


def test_matches_mirror(spark):
    rows = _mkdata(5)
    df = spark.createDataFrame(rows, "id bigint, v array<double>")
    assigns, cents = kmeans_lloyd(df, "id", "v", k=3, iterations=3)
    got_a = {r["id"]: r["cluster"] for r in assigns.collect()}
    got_c = {r["cluster"]: list(r["centroid"]) for r in cents.collect()}
    want_a, want_c = _py_kmeans(rows, 3, 3)
    assert got_a == want_a
    for c, v in want_c.items():
        assert got_c[c] == pytest.approx(v, abs=2e-6)


def test_clusters_recover_structure(spark):
    # well-separated blobs: every blob member lands in one cluster
    rows = _mkdata(9, spread=0.02)
    df = spark.createDataFrame(rows, "id bigint, v array<double>")
    assigns, _ = kmeans_lloyd(df, "id", "v", k=3, iterations=4)
    got = {r["id"]: r["cluster"] for r in assigns.collect()}
    for blob in range(3):
        labels = {got[i] for i in range(60) if i % 3 == blob}
        assert len(labels) == 1


def test_empty_cluster_keeps_centroid(spark):
    # k=3 over two tight far-apart blobs: one init centroid empties out
    rows = [(0, [0.0, 0.0]), (1, [0.01, 0.0]), (2, [0.02, 0.0]),
            (10, [9.0, 9.0]), (11, [9.01, 9.0])]
    df = spark.createDataFrame(rows, "id bigint, v array<double>")
    assigns, cents = kmeans_lloyd(df, "id", "v", k=3, iterations=3)
    want_a, want_c = _py_kmeans(rows, 3, 3)
    assert {r["id"]: r["cluster"] for r in assigns.collect()} == want_a
    got_c = {r["cluster"]: list(r["centroid"]) for r in cents.collect()}
    assert len(got_c) == 3
    for c, v in want_c.items():
        assert got_c[c] == pytest.approx(v, abs=2e-6)


def test_pca_fit_and_project(spark, tmp_path):
    import numpy as np

    rnd = np.random.RandomState(3)
    base = rnd.randn(120, 6) @ np.diag([5, 3, 1, 0.1, 0.1, 0.1])
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(120)],
        "vec_id bigint, embedding array<double>",
    )
    path = str(tmp_path / "emb.parquet")
    df.toPandas().to_parquet(path)

    from kgforge.datapipe.clustering import pca_fit_numpy, pca_project

    mu, comps = pca_fit_numpy(path, k=2)
    got = {
        r["id"]: (r["pc1"], r["pc2"])
        for r in pca_project(df, "vec_id", "embedding", mu, comps).collect()
    }
    x = base - base.mean(axis=0)
    want1 = x @ comps[0]
    want2 = x @ comps[1]
    for i in range(120):
        assert abs(got[i][0] - want1[i]) < 1e-5
        assert abs(got[i][1] - want2[i]) < 1e-5
    # the learned basis captures the dominant directions: projected
    # variance along pc1 >= pc2 >> original minor axes
    v1 = float(np.var([got[i][0] for i in range(120)]))
    v2 = float(np.var([got[i][1] for i in range(120)]))
    assert v1 >= v2 > float(np.var(x[:, 3]))
    # determinism: same file -> identical basis
    mu2, comps2 = pca_fit_numpy(path, k=2)
    assert np.array_equal(mu, mu2)
    assert all(np.array_equal(a, b) for a, b in zip(comps, comps2))
