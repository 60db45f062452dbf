"""Python mirrors for B-cubed clustering eval (datapipe/clustereval.py)
and k-way hash partition audit (kg/graphstats.py)."""

from __future__ import annotations

import pytest

from kgforge.datapipe.clustereval import bcubed_eval
from kgforge.kg.graphstats import partition_quality

_MOD = 2147483647
MICRO = 1_000_000


def _poly(s: str, mult: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % _MOD
    return acc


def _stage2_padded_py(s: str) -> int:
    return _poly(str(_poly(s, 1000003)).rjust(10, "0"), 1009)


_ASSIGN = [
    # id, predicted cluster, truth class — classic B³ toy example
    (1, "c1", "t1"), (2, "c1", "t1"), (3, "c1", "t2"),
    (4, "c2", "t2"), (5, "c2", "t2"),
    (6, "c3", "t1"), (7, "c3", "t3"),
]


def _py_bcubed(rows):
    from collections import Counter
    cells = Counter((c, t) for _i, c, t in rows)
    nc = Counter(c for _i, c, t in rows)
    nt = Counter(t for _i, c, t in rows)
    p = sum((o * o * MICRO) // nc[c] for (c, t), o in cells.items())
    r = sum((o * o * MICRO) // nt[t] for (c, t), o in cells.items())
    n = len(rows)
    pp, rp = p // n, r // n
    f1 = (2 * pp * rp) // (pp + rp) if pp + rp > 0 else None
    return n, pp, rp, f1


def test_bcubed_matches_python_mirror(spark):
    df = spark.createDataFrame(_ASSIGN, "id int, c string, t string")
    got = bcubed_eval(df, "id", "c", "t").collect()[0]
    n, pp, rp, f1 = _py_bcubed(_ASSIGN)
    assert (got["n_items"], got["prec_ppm"], got["rec_ppm"],
            got["f1_ppm"]) == (n, pp, rp, f1)
    # sanity: imperfect clustering scores strictly below 1
    assert 0 < got["prec_ppm"] < MICRO and 0 < got["rec_ppm"] < MICRO


def test_bcubed_perfect_clustering_scores_one(spark):
    rows = [(i, f"c{i % 3}", f"c{i % 3}") for i in range(9)]
    df = spark.createDataFrame(rows, "id int, c string, t string")
    got = bcubed_eval(df, "id", "c", "t").collect()[0]
    assert got["prec_ppm"] == MICRO and got["rec_ppm"] == MICRO
    assert got["f1_ppm"] == MICRO


def test_partition_quality_matches_python_mirror(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string")
    k = 4
    got = partition_quality(df, k).collect()[0]

    def part(x):
        return _stage2_padded_py(x) % k

    cut = sum(1 for s, d in edges if part(s) != part(d))
    nodes = {x for e in edges for x in e}
    from collections import Counter
    sizes = Counter(part(x) for x in nodes)
    assert got["n_edges"] == 40 and got["cut_edges"] == cut
    assert got["cut_ppm"] == (cut * MICRO) // 40
    assert got["n_nodes"] == len(nodes)
    assert got["min_part"] == min(sizes.values())
    assert got["max_part"] == max(sizes.values())
    assert got["balance_ppm"] == (max(sizes.values()) * k * MICRO) // len(nodes)


def test_partition_quality_validates_k(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        partition_quality(df, 1)
