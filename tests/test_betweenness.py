import random
from collections import deque

import pytest

from kgforge.kg.betweenness import betweenness


def _brandes(edges, sources, directed=False, max_depth=8):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
        else:
            adj.setdefault(b, set())
    bc = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for v in sorted(order, key=lambda x: -dist[x]):
            for w in adj.get(v, ()):
                if w in dist and dist[w] == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if v != s:
                bc[v] = bc.get(v, 0.0) + delta[v]
        for v in order:
            bc.setdefault(v, 0.0)
    if not directed:
        bc = {v: x / 2 for v, x in bc.items()}
    return bc


def _run(spark, edges, sources, **kw):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r["node"]: r["bc"] for r in betweenness(e, sources, **kw).collect()
    }


@pytest.mark.slow
def test_path_graph(spark):
    # P4: inner nodes carry 2.0 each, endpoints 0
    got = _run(spark, [(0, 1), (1, 2), (2, 3)], [0, 1, 2, 3])
    assert got["0"] == pytest.approx(0.0)
    assert got["1"] == pytest.approx(2.0)
    assert got["2"] == pytest.approx(2.0)
    assert got["3"] == pytest.approx(0.0)


def test_star_center(spark):
    # K1,4: center mediates all C(4,2)=6 leaf pairs
    got = _run(spark, [(9, i) for i in range(4)], [9, 0, 1, 2, 3])
    assert got["9"] == pytest.approx(6.0)
    assert all(got[str(i)] == pytest.approx(0.0) for i in range(4))


def test_random_matches_mirror(spark):
    rnd = random.Random(11)
    edges = sorted({tuple(sorted(rnd.sample(range(20), 2))) for _ in range(40)})
    sources = [str(i) for i in range(20)]
    want = _brandes([(str(a), str(b)) for a, b in edges], sources)
    got = _run(spark, edges, sources)
    assert set(got) >= set(want)
    for v, x in want.items():
        assert got[v] == pytest.approx(x, abs=1e-9), v


def test_depth_truncation_and_landmarks(spark):
    # P5 from a single landmark end, truncated at depth 2: only 0-1-2 DAG
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    want = _brandes([(str(a), str(b)) for a, b in edges], ["0"], max_depth=2)
    got = _run(spark, edges, ["0"], max_depth=2)
    for v, x in want.items():
        assert got[v] == pytest.approx(x, abs=1e-9), v
    assert "4" not in got  # beyond the depth bound, no contribution row
