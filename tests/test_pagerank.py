"""PageRank DataFrame loop vs a numpy power-iteration mirror."""

from __future__ import annotations

import numpy as np
import pytest

from kgforge.kg.pagerank import pagerank


def _numpy_pagerank(edges, iterations=5, damping=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        inflow = np.zeros(n)
        for u, v in edges:
            inflow[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) / n + damping * (inflow + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


@pytest.fixture(scope="module")
def graph():
    # deterministic scale-free-ish graph: 200 nodes, preferential wiring,
    # node 0 a hub, nodes 190..199 dangling (edges out of them omitted)
    rng = np.random.RandomState(7)
    edges = []
    for v in range(1, 190):
        for _ in range(1 + v % 3):
            u = int(rng.randint(0, v))  # earlier nodes collect in-links
            if u != v:
                edges.append((v, u))
    for v in range(190, 200):
        edges.append((int(rng.randint(0, 50)), v))  # in-links only: dangling
    return sorted(set(edges))


def test_pagerank_matches_numpy(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=5).collect()}
    want = _numpy_pagerank(graph, iterations=5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # conservation: damped walk keeps total mass at 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_hub_ranks_highest(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=5).collect()}
    assert max(got, key=got.get) == 0


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src bigint, dst bigint")
    assert pagerank(df).count() == 0


def test_driver_and_distributed_paths_agree(spark, graph):
    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    dist = {r["node"]: r["rank"] for r in pagerank(df, iterations=5).collect()}
    drv = {r["node"]: r["rank"] for r in
           pagerank(df, iterations=5, driver_threshold=10**6).collect()}
    assert set(dist) == set(drv)
    for k in dist:
        assert drv[k] == pytest.approx(dist[k], abs=1e-9)


# --- personalized PageRank ----------------------------------------------------


def _numpy_ppr(edges, sources, iterations=5, damping=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    present = [s for s in sources if s in idx]
    p = np.zeros(n)
    for s in present:
        p[idx[s]] = 1.0 / len(present)
    r = p.copy()
    for _ in range(iterations):
        inflow = np.zeros(n)
        for u, v in edges:
            inflow[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) * p + damping * (inflow + dangling * p)
    return {nodes[i]: r[i] for i in range(n)}


def test_ppr_matches_numpy(spark, graph):
    from kgforge.kg.pagerank import personalized_pagerank

    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    srcs = [0, 5, 17]
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, srcs, iterations=5).collect()
    }
    want = _numpy_ppr(graph, srcs, iterations=5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_ppr_concentrates_near_sources(spark, graph):
    from kgforge.kg.pagerank import personalized_pagerank

    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, [5], iterations=5).collect()
    }
    # the restart node itself dominates its own neighborhood walk
    assert max(got, key=got.get) == 5


def test_ppr_driver_and_distributed_agree(spark, graph):
    from kgforge.kg.pagerank import personalized_pagerank

    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    srcs = [3, 7]
    dist = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, srcs, iterations=4).collect()
    }
    drv = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            df, srcs, iterations=4, driver_threshold=10**6
        ).collect()
    }
    assert set(dist) == set(drv)
    for k in dist:
        assert dist[k] == pytest.approx(drv[k], abs=1e-12)


def test_ppr_absent_sources_renormalize_and_empty_raises(spark, graph):
    from kgforge.kg.pagerank import personalized_pagerank

    df = spark.createDataFrame(graph, "src bigint, dst bigint")
    with_ghost = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, [5, 10**9], iterations=3).collect()
    }
    only_real = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, [5], iterations=3).collect()
    }
    for k in only_real:
        assert with_ghost[k] == pytest.approx(only_real[k], abs=1e-12)
    with pytest.raises(ValueError, match="source"):
        personalized_pagerank(df, [10**9], iterations=2).collect()


def test_warm_start_resume_equals_cold(spark):
    """Checkpoint-resume for the iterative layer: 3 cold rounds persisted,
    then 2 warm rounds from that vector == 5 cold rounds (round-6: only
    float summation order may differ across the checkpoint boundary)."""
    from pyspark.sql import functions as F

    from kgforge.kg.pagerank import pagerank

    edges = spark.range(300).select(
        F.col("id").alias("src"),
        F.pmod(F.col("id") * 7 + 3, F.lit(300)).alias("dst"),
    )
    cold = {
        r["node"]: round(r["rank"], 6)
        for r in pagerank(edges, iterations=5).collect()
    }
    mid = pagerank(edges, iterations=3)
    warm = {
        r["node"]: round(r["rank"], 6)
        for r in pagerank(edges, iterations=2, init_ranks=mid).collect()
    }
    assert warm == cold
