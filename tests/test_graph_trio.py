"""Unit tests for rich-club coefficient, fixed-point SimRank, and bow-tie
decomposition — each against a brute-force python mirror."""

from __future__ import annotations

import pytest

from collections import defaultdict

from pyspark.sql import Row

from kgforge.kg.bowtie import bowtie_decomposition
from kgforge.kg.graphstats import rich_club
from kgforge.kg.simrank import SCALE, simrank


def _edges_df(spark, pairs, cols=("src", "dst")):
    return spark.createDataFrame(
        [Row(**{cols[0]: a, cols[1]: b}) for a, b in pairs]
    )


# ---------------------------------------------------------------- rich club
def _rich_club_py(pairs, ks):
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    out = {}
    for k in ks:
        rich = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in pairs if a in rich and b in rich)
        nk = len(rich)
        phi = round(2 * ek / (nk * (nk - 1)), 6) if nk >= 2 else None
        out[k] = (nk, ek, phi)
    return out


def test_rich_club_clique_plus_pendant(spark):
    # K4 on 0-3 plus a pendant node 9 attached to 0
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 9)]
    ks = [0, 1, 2, 3]
    got = {
        r.k: (r.n_nodes, r.n_edges, r.phi)
        for r in rich_club(_edges_df(spark, pairs), ks=ks).collect()
    }
    assert got == _rich_club_py(pairs, ks)
    # degree>2 keeps only the K4 (pendant excluded): phi == 1
    assert got[2][2] == 1.0


def test_rich_club_empty_threshold(spark):
    pairs = [(1, 2)]
    got = {r.k: r for r in rich_club(_edges_df(spark, pairs), ks=[5]).collect()}
    assert got[5].n_nodes == 0 and got[5].phi is None


# ------------------------------------------------------------------ simrank
def _simrank_py(pairs, iterations=3, c_num=8, c_den=10):
    nodes = sorted({n for p in pairs for n in p})
    inn = defaultdict(list)
    epairs = sorted(set((a, b) for a, b in pairs if a != b))
    for a, b in epairs:
        inn[b].append(a)
    s = {(n, n): SCALE for n in nodes}
    for _ in range(iterations):
        new = {(n, n): SCALE for n in nodes}
        for x in nodes:
            for y in nodes:
                if x == y or not inn[x] or not inn[y]:
                    continue
                tot = sum(s.get((i, j), 0) for i in inn[x] for j in inn[y])
                v = (c_num * tot) // (c_den * len(inn[x]) * len(inn[y]))
                if v > 0:
                    new[(x, y)] = v
        s = new
    return {
        (a, b): v / SCALE for (a, b), v in s.items() if a < b and v > 0
    }


def test_simrank_matches_python_mirror(spark):
    # two "papers" 3,4 citing the same sources 1,2 -> similar;
    # 5 cites only 1
    pairs = [(1, 3), (2, 3), (1, 4), (2, 4), (1, 5)]
    got = {
        (r.a, r.b): r.simrank
        for r in simrank(_edges_df(spark, pairs), iterations=3).collect()
    }
    assert got == _simrank_py(pairs)
    # co-cited pair (3,4) must be the most similar
    assert got[(3, 4)] == max(got.values())


def test_simrank_cycle(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2)]
    got = {
        (r.a, r.b): r.simrank
        for r in simrank(_edges_df(spark, pairs), iterations=3).collect()
    }
    assert got == _simrank_py(pairs)


def test_simrank_no_shared_inputs_zero(spark):
    pairs = [(1, 2), (3, 4)]
    got = simrank(_edges_df(spark, pairs), iterations=3).collect()
    # 2 and 4 have disjoint in-neighborhoods whose members never become
    # similar -> no nonzero off-diagonal survives
    assert got == []


# ------------------------------------------------------------------ bow-tie
def _bowtie_py(pairs):
    nodes = sorted({str(n) for p in pairs for n in p})
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[str(a)].add(str(b))

    def closure(starts, graph):
        seen = set(starts)
        todo = list(starts)
        while todo:
            u = todo.pop()
            for v in graph[u]:
                if v not in seen:
                    seen.add(v)
                    todo.append(v)
        return seen

    fwd = {n: closure({n}, adj) for n in nodes}
    sccs = defaultdict(set)
    for n in nodes:
        members = {m for m in fwd[n] if n in fwd[m]} | {n}
        sccs[min(members)] |= members
    core_lab = sorted(sccs, key=lambda l: (-len(sccs[l]), l))[0]
    core = sccs[core_lab]
    radj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            radj[str(b)].add(str(a))
    reached = closure(core, adj)
    reaches = closure(core, radj)
    out = {}
    for n in nodes:
        if n in core:
            p = "core"
        elif n in reaches:
            p = "in"
        elif n in reached:
            p = "out"
        else:
            p = "other"
        out.setdefault(p, []).append(n)
    return {
        p: (len(v), min(v)) for p, v in out.items()
    }


def test_bowtie_textbook_shape(spark):
    # core cycle 1<->2, tail 0 -> 1 (in), 2 -> 3 (out), island 8 -> 9
    pairs = [(1, 2), (2, 1), (0, 1), (2, 3), (8, 9)]
    got = {
        r.part: (r.n_nodes, r.min_node)
        for r in bowtie_decomposition(_edges_df(spark, pairs)).collect()
    }
    assert got == _bowtie_py(pairs)
    assert got["core"] == (2, "1")
    assert got["in"] == (1, "0")
    assert got["out"] == (1, "3")
    assert got["other"] == (2, "8")


@pytest.mark.slow
def test_bowtie_all_core(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    got = {
        r.part: r.n_nodes
        for r in bowtie_decomposition(_edges_df(spark, pairs)).collect()
    }
    assert got == {"core": 3}
