import random

import pytest

from kgforge.kg.graphstats import degree_assortativity


def _numpy_r(edges):
    import numpy as np

    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    return float(np.corrcoef(xs, ys)[0, 1])


def _run(spark, edges):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    return degree_assortativity(e).collect()[0]


def test_star_is_disassortative(spark):
    # star K1,4: every edge joins degree 4 to degree 1 -> r = -1
    r = _run(spark, [(0, i) for i in (1, 2, 3, 4)])
    assert r["n_nodes"] == 5 and r["n_edges"] == 4
    assert r["mean_degree"] == pytest.approx(8 / 5)
    assert r["assortativity"] == pytest.approx(-1.0)


def test_regular_graph_undefined(spark):
    # 4-cycle: every endpoint degree 2, zero variance -> NULL
    r = _run(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert r["assortativity"] is None


def test_random_graph_matches_numpy(spark):
    rnd = random.Random(7)
    edges = sorted({tuple(sorted(rnd.sample(range(30), 2))) for _ in range(80)})
    r = _run(spark, edges)
    assert r["assortativity"] == pytest.approx(_numpy_r(edges), abs=1e-9)
