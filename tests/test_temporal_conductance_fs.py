"""Unit mirrors: kg.temporal.temporal_reachability, graphstats.conductance,
blocking.fellegi_sunter_weights."""

from __future__ import annotations

import math
import random

from kgforge.datapipe.blocking import fellegi_sunter_weights
from kgforge.kg.graphstats import conductance
from kgforge.kg.temporal import temporal_reachability


def test_temporal_vs_static_reachability(spark):
    # u->v@5 then v->w@3: static path exists, temporal does not
    edges = spark.createDataFrame(
        [("u", "v", 5), ("v", "w", 3), ("v", "x", 9)], "src string, dst string, ts long"
    )
    got = {r["id"]: r["arrival"]
           for r in temporal_reachability(edges, ["u"]).collect()}
    assert got == {"u": 0, "v": 5, "x": 9}  # w absent: 3 < arrival(v)=5


def test_temporal_reachability_python_mirror(spark):
    rng = random.Random(4)
    edges = [
        (rng.randrange(40), rng.randrange(40), rng.randrange(100))
        for _ in range(300)
    ]
    df = spark.createDataFrame(edges, "src int, dst int, ts long")
    got = {r["id"]: r["arrival"]
           for r in temporal_reachability(df, [0, 1], t0=10).collect()}

    arr = {"0": 10, "1": 10}
    changed = True
    while changed:
        changed = False
        for u, v, t in edges:
            su, sv = str(u), str(v)
            if su in arr and t >= arr[su] and t < arr.get(sv, 1 << 60):
                arr[sv] = t
                changed = True
    assert got == arr


def test_conductance_two_cliques_with_bridge(spark):
    e = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                e.append((base + i, base + j))
    e.append((0, 5))
    edges = spark.createDataFrame(e, "src int, dst int")
    labels = spark.createDataFrame(
        [(n, n // 5) for n in range(10)], "node int, label int"
    )
    rows = {r["label"]: r for r in conductance(edges, labels).collect()}
    # per clique: cut = 1 (the bridge), volume = 21, 2m - vol = 21
    for lbl in (0, 1):
        assert (rows[lbl]["cut"], rows[lbl]["volume"]) == (1, 21)
        assert rows[lbl]["conductance"] == round(1 / 21, 6)


def test_conductance_whole_graph_community_is_null(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    labels = spark.createDataFrame([(n, 0) for n in (1, 2, 3)],
                                   "node int, label int")
    r = conductance(edges, labels).collect()[0]
    assert r["cut"] == 0 and r["conductance"] is None


def test_fellegi_sunter_weights_mirror(spark):
    rng = random.Random(12)
    rows = []
    for _ in range(600):
        is_m = rng.random() < 0.3
        name_agree = rng.random() < (0.9 if is_m else 0.1)
        city_agree = rng.random() < (0.7 if is_m else 0.4)
        rows.append((is_m, name_agree, city_agree))
    df = spark.createDataFrame(rows, "matched boolean, name_a boolean, city_a boolean")
    got = {r["field"]: r for r in
           fellegi_sunter_weights(df, "matched", ["name_a", "city_a"]).collect()}

    nm = sum(1 for m, _, _ in rows if m)
    nu = len(rows) - nm
    for field, idx in (("name_a", 1), ("city_a", 2)):
        am = sum(1 for r in rows if r[0] and r[idx])
        au = sum(1 for r in rows if not r[0] and r[idx])
        m = (am + 1) / (nm + 2)
        u = (au + 1) / (nu + 2)
        r = got[field]
        assert (r["n_match"], r["n_unmatch"]) == (nm, nu)
        assert (r["agree_m"], r["agree_u"]) == (am, au)
        assert abs(r["m"] - round(m, 6)) <= 1e-6
        assert abs(r["w_agree"] - round(math.log2(m / u), 6)) <= 1e-6
        assert abs(
            r["w_disagree"] - round(math.log2((1 - m) / (1 - u)), 6)
        ) <= 1e-6
    # discriminative field earns the bigger agreement weight
    assert got["name_a"]["w_agree"] > got["city_a"]["w_agree"]
