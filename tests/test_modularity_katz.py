"""Unit mirrors for graphstats.modularity and pagerank.katz_centrality."""

from __future__ import annotations

import random

from kgforge.kg.graphstats import modularity
from kgforge.kg.pagerank import katz_centrality


def _two_cliques_with_bridge():
    # two 5-cliques joined by one bridge edge: the textbook Q ≈ 0.45 case
    e = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                e.append((base + i, base + j))
    e.append((0, 5))
    return e


def test_modularity_two_cliques(spark):
    edges = spark.createDataFrame(_two_cliques_with_bridge(), "src int, dst int")
    labels = spark.createDataFrame(
        [(n, n // 5) for n in range(10)], "node int, label int"
    )
    rows = {r["label"]: r for r in modularity(edges, labels).collect()}
    m = 21  # 2*10 clique edges + bridge
    for lbl in (0, 1):
        r = rows[lbl]
        assert r["n_nodes"] == 5 and r["m_intra"] == 10
        d = r["d_total"]
        assert d == 21  # 5 nodes of degree 4 + one bridge endpoint
        want = round(10 / m - (d / (2 * m)) ** 2, 6)
        assert r["contribution"] == want
    q = sum(r["contribution"] for r in rows.values())
    assert 0.4 < q < 0.5


def test_modularity_random_partition_vs_python_mirror(spark):
    rng = random.Random(3)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    part = {n: rng.randrange(4) for n in range(30)}
    df_e = spark.createDataFrame(edges, "src int, dst int")
    df_l = spark.createDataFrame(list(part.items()), "node int, label int")
    got = {r["label"]: r for r in modularity(df_e, df_l).collect()}

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    m = len(und)
    deg, m_c, d_c, n_c = {}, {}, {}, {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        if part[a] == part[b]:
            m_c[part[a]] = m_c.get(part[a], 0) + 1
    for n, l in part.items():
        n_c[l] = n_c.get(l, 0) + 1
        d_c[l] = d_c.get(l, 0) + deg.get(n, 0)
    for l in n_c:
        r = got[l]
        assert r["n_nodes"] == n_c[l]
        assert r["m_intra"] == m_c.get(l, 0)
        assert r["d_total"] == d_c[l]
        want = round(m_c.get(l, 0) / m - (d_c[l] / (2 * m)) ** 2, 6)
        assert r["contribution"] == want


def test_katz_exact_integer_mirror(spark):
    rng = random.Random(9)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(80)})
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["katz_mu"] for r in katz_centrality(df).collect()}

    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(b, set()).add(a)
        adj.setdefault(a, set()).add(b)
    scale = 10**6
    x = {n: scale for n in adj}
    for _ in range(6):
        x = {
            v: scale + sum(x[u] for u in adj[v]) // 20
            for v in adj
        }
    assert got == x


def test_katz_directed_star(spark):
    # hub <- 4 spokes, one hop: hub = 1e6 + 4e6 div 20, spokes stay 1e6
    edges = spark.createDataFrame(
        [(i, 99) for i in range(1, 5)], "src int, dst int"
    )
    got = {
        r["node"]: r["katz_mu"]
        for r in katz_centrality(edges, iterations=1, directed=True).collect()
    }
    assert got[99] == 10**6 + (4 * 10**6) // 20
    assert all(got[i] == 10**6 for i in range(1, 5))
