import itertools
import random

import pytest

from kgforge.kg.truss import k_truss


def _brute(edges, k):
    cur = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while cur:
        sup = _support(cur)
        kept = {e for e in cur if sup.get(e, 0) >= k - 2}
        if kept == cur:
            break
        cur = kept
    return {e: _support(cur).get(e, 0) for e in cur}


def _support(cur):
    nbrs = {}
    for a, b in cur:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    sup = {}
    for a, b in cur:
        sup[(a, b)] = len(nbrs[a] & nbrs[b])
    return sup


def _run(spark, edges, k):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {(r["a"], r["b"]): r["sup"] for r in k_truss(e, k=k).collect()}


def test_k4_with_pendant(spark):
    # K4 is a 4-truss (support 2 on every edge); the pendant edge dies at k=3
    k4 = list(itertools.combinations(range(4), 2))
    edges = k4 + [(3, 9)]
    assert _run(spark, edges, 3) == {e: 2 for e in k4}
    assert _run(spark, edges, 4) == {e: 2 for e in k4}
    assert _run(spark, edges, 5) == {}


def test_cascade_peeling(spark):
    # two triangles sharing an edge: every edge has support >= 1, but at
    # k=4 the outer edges (support 1) die first, then the shared edge —
    # the peeling must iterate, not just filter once
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (0, 3)]
    assert _run(spark, edges, 3) == {e: _brute(edges, 3)[e] for e in _brute(edges, 3)}
    assert _run(spark, edges, 4) == {}


@pytest.mark.slow
def test_random_mirror(spark):
    rnd = random.Random(33)
    edges = sorted({tuple(sorted(rnd.sample(range(15), 2))) for _ in range(55)})
    for k in (3, 4, 5):
        assert _run(spark, edges, k) == _brute(edges, k)


def test_k_below_3_rejected(spark):
    e = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    with pytest.raises(ValueError):
        k_truss(e, k=2)
