import random

from kgforge.kg.matching import maximal_matching


def _poly(s, mult):
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % 2147483647
    return acc


def _pri(a, b, r):
    h = _poly(str(_poly(f"{a}\x1f{b}\x1f{r}", 31)), 1009)
    return f"{h:010d}|{a}|{b}"


def _mirror(edge_list, max_rounds=60):
    live = {
        (min(s, d), max(s, d)) for s, d in edge_list if s != d
    }
    matched = set()
    for r in range(max_rounds):
        if not live:
            return matched
        pri = {e: _pri(e[0], e[1], r) for e in live}
        vmin = {}
        for (a, b), p in pri.items():
            for v in (a, b):
                vmin[v] = min(vmin.get(v, p), p)
        sel = {
            e for e, p in pri.items()
            if vmin[e[0]] == p and vmin[e[1]] == p
        }
        matched |= sel
        used = {v for e in sel for v in e}
        live = {e for e in live if e[0] not in used and e[1] not in used}
    raise AssertionError("mirror did not converge")


def _run(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src string, dst string")
    got = maximal_matching(df).collect()
    return {(r["a"], r["b"]) for r in got}


def _assert_maximal_matching(edge_list, matched):
    used = [v for e in matched for v in e]
    assert len(used) == len(set(used)), "two matched edges share a vertex"
    canon = {(min(s, d), max(s, d)) for s, d in edge_list if s != d}
    for a, b in canon - matched:
        assert a in used or b in used, f"edge ({a},{b}) could be added"


def test_random_graph_matches_mirror_and_is_maximal(spark):
    rng = random.Random(17)
    edges = [
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
        for _ in range(150)
    ]
    got = _run(spark, edges)
    assert got == _mirror(edges)
    _assert_maximal_matching(edges, got)


def test_star_matches_exactly_one_edge(spark):
    edges = [("hub", f"x{i:02d}") for i in range(20)]
    got = _run(spark, edges)
    assert len(got) == 1
    assert got == _mirror(edges)


def test_path_and_parallel_edges(spark):
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "d")]
    got = _run(spark, edges)
    assert got == _mirror(edges)
    _assert_maximal_matching(edges, got)
