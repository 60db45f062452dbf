"""A6 scale-path equivalence: the pairs / ranges / grouped k-anonymity
strategies must produce identical k, and the scalable paths must work on the
skew case that kills the pair join (one generalization group = whole table).
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # numpy-mirror scale sweeps; kanon oracles stay in the default lane

from kgforge.anonymize.kpi import k_anonymity
from kgforge.config import AttrConfig
from kgforge.triples import RDF_TYPE

T = "http://ex.org/Person"
A0 = "http://ex.org/salary"
A1 = "http://ex.org/age"
A2 = "http://ex.org/height"
GEN = "http://ex.org/grp"


def _mk_triples(spark, n, *, n_groups, rand_attrs, null_frac=0.1, seed=7):
    rng = random.Random(seed)
    rows = []
    data = {}
    for i in range(n):
        s = f"http://ex.org/r{i:06d}"
        rows.append((s, RDF_TYPE, T, "iri", True))
        if n_groups > 1:
            grp = f"g{rng.randrange(n_groups)}"
            rows.append((s, GEN + "_generalized", grp, "iri", True))
        else:
            grp = None
        rec = {"grp": grp}
        for attr in rand_attrs:
            if rng.random() < null_frac:
                rec[attr] = (None, None)
            else:
                o = round(rng.uniform(0, 1000), 3)
                r = round(o + rng.uniform(-50, 50), 3)
                rows.append((s, attr, repr(o), "xsd:double", False))
                rows.append((s, attr + "_randomized", repr(r), "xsd:double", False))
                rec[attr] = (o, r)
        data[s] = rec
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string, obj_dtype string, obj_is_iri boolean"
    )
    return df, data


def _expected_k(data, rand_attrs):
    """Plain-python mirror of KpiService.calculateKAnonymity."""
    subs = list(data)
    benches = {}
    for attr in rand_attrs:
        ds = [
            abs(rec[attr][0] - rec[attr][1])
            for rec in data.values()
            if rec[attr][0] is not None
        ]
        benches[attr] = (2.0 * sum(ds) / len(ds)) if ds else None
    k = None
    for s in subs:
        cnt = 0
        for s2 in subs:
            if data[s]["grp"] != data[s2]["grp"]:
                continue
            ok = True
            for attr in rand_attrs:
                o1, r1 = data[s][attr]
                o2, _ = data[s2][attr]
                if o1 is None and o2 is None:
                    continue
                b = benches[attr]
                if o1 is None or o2 is None or b is None:
                    ok = False
                    break
                if not (r1 - b <= o2 <= r1 + b):
                    ok = False
                    break
            if ok:
                cnt += 1
        k = cnt if k is None else min(k, cnt)
    return k or 0


CFG = {
    GEN: AttrConfig("double", "generalization"),
    A0: AttrConfig("double", "randomization"),
    A1: AttrConfig("double", "randomization"),
    A2: AttrConfig("double", "randomization"),
}


def test_ranges_equals_pairs_single_attr(spark):
    triples, data = _mk_triples(spark, 400, n_groups=5, rand_attrs=[A0])
    used = [GEN, A0]
    k_pairs = k_anonymity(triples, T, used, CFG, mode="pairs")
    k_ranges = k_anonymity(triples, T, used, CFG, mode="ranges")
    assert k_pairs == k_ranges == _expected_k(data, [A0])


def test_grouped_equals_pairs_two_attrs(spark):
    triples, data = _mk_triples(spark, 300, n_groups=4, rand_attrs=[A0, A1])
    used = [GEN, A0, A1]
    k_pairs = k_anonymity(triples, T, used, CFG, mode="pairs")
    k_grouped = k_anonymity(triples, T, used, CFG, mode="grouped")
    assert k_pairs == k_grouped == _expected_k(data, [A0, A1])


def test_ranges_survives_single_giant_group(spark):
    """The skew case: no generalization attr → every resource lands in ONE
    null group.  The pair join would build n² rows; the ranges path is a
    sort + prefix sum and must both finish and agree with a numpy oracle."""
    n = 30_000
    rng = np.random.default_rng(11)
    o = np.round(rng.uniform(0, 1000, n), 3)
    r = np.round(o + rng.uniform(-50, 50, n), 3)
    rows = []
    for i in range(n):
        s = f"http://ex.org/r{i:06d}"
        rows.append((s, RDF_TYPE, T, "iri", True))
        rows.append((s, A0, repr(float(o[i])), "xsd:double", False))
        rows.append((s, A0 + "_randomized", repr(float(r[i])), "xsd:double", False))
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string, obj_dtype string, obj_is_iri boolean"
    )
    k = k_anonymity(triples, T, [A0], CFG, mode="ranges")
    bench = 2.0 * np.abs(o - r).mean()
    so = np.sort(o)
    lo = np.searchsorted(so, r - bench, side="left")
    hi = np.searchsorted(so, r + bench, side="right")
    assert k == int((hi - lo).min())


def test_auto_dispatch(spark):
    triples, data = _mk_triples(spark, 200, n_groups=3, rand_attrs=[A0])
    used = [GEN, A0]
    # auto with a tiny threshold must take the scalable path and still agree
    k_auto_small = k_anonymity(triples, T, used, CFG, mode="auto", pair_threshold=10)
    k_auto_big = k_anonymity(triples, T, used, CFG, mode="auto")
    assert k_auto_small == k_auto_big == _expected_k(data, [A0])


def test_nulls_and_empty_bench(spark):
    # all originals null for one attr → bench None → only null-pairs count
    rows = []
    for i in range(20):
        s = f"http://ex.org/r{i:02d}"
        rows.append((s, RDF_TYPE, T, "iri", True))
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string, obj_dtype string, obj_is_iri boolean"
    )
    for m in ("pairs", "ranges"):
        k = k_anonymity(triples, T, [A0], CFG, mode=m)
        assert k == 20, m


def test_grid_equals_pairs_two_attrs(spark):
    triples, data = _mk_triples(spark, 350, n_groups=4, rand_attrs=[A0, A1],
                                null_frac=0.15)
    used = [GEN, A0, A1]
    k_pairs = k_anonymity(triples, T, used, CFG, mode="pairs")
    k_grid = k_anonymity(triples, T, used, CFG, mode="grid")
    assert k_pairs == k_grid == _expected_k(data, [A0, A1])


def test_sliced_equals_pairs_two_attrs(spark):
    triples, data = _mk_triples(spark, 300, n_groups=4, rand_attrs=[A0, A1],
                                null_frac=0.2)
    used = [GEN, A0, A1]
    k_pairs = k_anonymity(triples, T, used, CFG, mode="pairs")
    k_sliced = k_anonymity(triples, T, used, CFG, mode="sliced")
    assert k_pairs == k_sliced == _expected_k(data, [A0, A1])


def test_sliced_equals_pairs_three_attrs(spark):
    triples, data = _mk_triples(spark, 250, n_groups=3,
                                rand_attrs=[A0, A1, A2], null_frac=0.15)
    used = [GEN, A0, A1, A2]
    k_pairs = k_anonymity(triples, T, used, CFG, mode="pairs")
    k_grouped = k_anonymity(triples, T, used, CFG, mode="grouped")
    k_sliced = k_anonymity(triples, T, used, CFG, mode="sliced")
    assert k_pairs == k_grouped == k_sliced == _expected_k(data, [A0, A1, A2])


def test_sliced_survives_single_giant_group_three_attrs(spark):
    """The ≥3-attr skew case: one group, 20k rows — `grouped` would pin the
    whole group into one pandas partition, `pairs` would build 4·10⁸ rows;
    the sliced path (attr-0 slabs + cogrouped searchsorted) must finish
    distributed and match a numpy oracle."""
    n = 20_000
    rng = np.random.default_rng(17)
    o = [
        np.round(rng.uniform(0, 1000, n), 3),
        np.round(rng.uniform(-500, 500, n), 3),
        np.round(rng.uniform(100, 300, n), 3),
    ]
    r = [
        np.round(o[0] + rng.uniform(-40, 40, n), 3),
        np.round(o[1] + rng.uniform(-25, 25, n), 3),
        np.round(o[2] + rng.uniform(-10, 10, n), 3),
    ]
    attrs = [A0, A1, A2]
    rows = []
    for i in range(n):
        s = f"http://ex.org/r{i:06d}"
        rows.append((s, RDF_TYPE, T, "iri", True))
        for j, attr in enumerate(attrs):
            rows.append((s, attr, repr(float(o[j][i])), "xsd:double", False))
            rows.append(
                (s, attr + "_randomized", repr(float(r[j][i])), "xsd:double", False)
            )
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string, obj_dtype string, obj_is_iri boolean"
    )
    k = k_anonymity(triples, T, attrs, CFG, mode="sliced")
    b = [2.0 * np.abs(o[j] - r[j]).mean() for j in range(3)]
    order = np.argsort(o[0], kind="stable")
    so = [o[j][order] for j in range(3)]
    kmin = None
    for i in range(n):
        lo = np.searchsorted(so[0], r[0][i] - b[0], side="left")
        hi = np.searchsorted(so[0], r[0][i] + b[0], side="right")
        ok = np.ones(hi - lo, dtype=bool)
        for j in (1, 2):
            seg = so[j][lo:hi]
            ok &= (seg >= r[j][i] - b[j]) & (seg <= r[j][i] + b[j])
        c = int(ok.sum())
        kmin = c if kmin is None else min(kmin, c)
    assert k == kmin


def test_grid_survives_single_giant_group_two_attrs(spark):
    """The 2-attr skew case: one group, 20k rows — the pair join would build
    4·10⁸ pairs; the grid path (prefix-matrix interior + perimeter-verified
    boundary) must finish and match a numpy rectangle-count oracle."""
    n = 20_000
    rng = np.random.default_rng(13)
    o0 = np.round(rng.uniform(0, 1000, n), 3)
    r0 = np.round(o0 + rng.uniform(-40, 40, n), 3)
    o1 = np.round(rng.uniform(-500, 500, n), 3)
    r1 = np.round(o1 + rng.uniform(-25, 25, n), 3)
    rows = []
    for i in range(n):
        s = f"http://ex.org/r{i:06d}"
        rows.append((s, RDF_TYPE, T, "iri", True))
        rows.append((s, A0, repr(float(o0[i])), "xsd:double", False))
        rows.append((s, A0 + "_randomized", repr(float(r0[i])), "xsd:double", False))
        rows.append((s, A1, repr(float(o1[i])), "xsd:double", False))
        rows.append((s, A1 + "_randomized", repr(float(r1[i])), "xsd:double", False))
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string, obj_dtype string, obj_is_iri boolean"
    )
    k = k_anonymity(triples, T, [A0, A1], CFG, mode="grid")
    b0 = 2.0 * np.abs(o0 - r0).mean()
    b1 = 2.0 * np.abs(o1 - r1).mean()
    # numpy oracle: sort by o0, window via searchsorted, verify o1
    order = np.argsort(o0, kind="stable")
    so0, so1 = o0[order], o1[order]
    kmin = None
    for i in range(n):
        lo = np.searchsorted(so0, r0[i] - b0, side="left")
        hi = np.searchsorted(so0, r0[i] + b0, side="right")
        seg = so1[lo:hi]
        c = int(((seg >= r1[i] - b1) & (seg <= r1[i] + b1)).sum())
        kmin = c if kmin is None else min(kmin, c)
    assert k == kmin


def test_auto_two_attr_routes_by_group_count(spark):
    """Auto dispatch above the pair threshold: few groups → grid (driver
    prefix matrices are bounded), many groups → sliced (executor-resident).
    Both must agree with pairs on the same input."""
    from kgforge.anonymize import kpi as kpi_mod

    used = [GEN, A0, A1]
    triples, data = _mk_triples(spark, 300, n_groups=40, rand_attrs=[A0, A1])

    k_many = k_anonymity(triples, T, used, CFG, mode="auto",
                         pair_threshold=10, grid_group_budget=8)
    assert kpi_mod._last_mode == "sliced"

    k_few = k_anonymity(triples, T, used, CFG, mode="auto",
                        pair_threshold=10, grid_group_budget=1000)
    assert kpi_mod._last_mode == "grid"

    k_pairs = k_anonymity(triples, T, used, CFG, mode="pairs")
    assert k_many == k_few == k_pairs == _expected_k(data, [A0, A1])
