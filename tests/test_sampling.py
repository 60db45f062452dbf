import pytest

from kgforge.kg.sampling import neighbor_sample


def _poly(s, mult):
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % 2147483647
    return acc


def _stage2_py(s):
    return _poly(str(_poly(s, 31)), 1009)


def _mirror(edge_list, seeds, fanouts, directed):
    adj = {}
    for s, d in edge_list:
        if s != d:
            adj.setdefault(s, set()).add(d)
            if not directed:
                adj.setdefault(d, set()).add(s)
    out = set()
    frontier = {(s, s) for s in seeds}
    for layer, f in enumerate(fanouts):
        nxt = set()
        for seed, node in frontier:
            nbrs = sorted(
                adj.get(node, ()),
                key=lambda d: (
                    _stage2_py(f"{seed}\x1f{node}\x1f{d}\x1f{layer}"),
                    d,
                ),
            )[:f]
            for d in nbrs:
                out.add((seed, layer, node, d))
                nxt.add((seed, d))
        frontier = nxt
    return out


def _run(spark, edge_list, seeds, fanouts, directed=True):
    df = spark.createDataFrame(edge_list, "src string, dst string")
    got = neighbor_sample(df, seeds, fanouts, directed=directed).collect()
    return {(r["seed"], r["layer"], r["src"], r["dst"]) for r in got}


def test_two_layer_fanout_matches_mirror(spark):
    edges = [
        (f"n{i}", f"n{(i * 5 + j) % 20}") for i in range(20) for j in (1, 2, 3, 7)
    ]
    seeds = ["n0", "n3"]
    got = _run(spark, edges, seeds, [3, 2])
    assert got == _mirror(edges, seeds, [3, 2], True)


def test_undirected_and_hub_cut(spark):
    hub = [("h", f"x{i}") for i in range(40)]  # hub with degree 40
    edges = hub + [("x0", "y"), ("x1", "y")]
    got = _run(spark, edges, ["h"], [5], directed=False)
    assert len(got) == 5  # hub cut to fanout
    assert got == _mirror(hub + [("x0", "y"), ("x1", "y")], ["h"], [5], False)


def test_frontier_is_distinct_per_seed(spark):
    # two layer-0 picks reach the same node; layer 1 expands it ONCE
    edges = [("s", "m1"), ("s", "m2"), ("m1", "t"), ("m2", "t"), ("t", "u"), ("t", "v")]
    got = _run(spark, edges, ["s"], [2, 2, 2])
    want = _mirror(edges, ["s"], [2, 2, 2], True)
    assert got == want
    t_expansions = [g for g in got if g[1] == 2 and g[2] == "t"]
    assert len(t_expansions) == 2  # u and v once each, not twice


def test_bad_fanouts_rejected(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        neighbor_sample(df, ["a"], [])
    with pytest.raises(ValueError):
        neighbor_sample(df, ["a"], [2, 0])
