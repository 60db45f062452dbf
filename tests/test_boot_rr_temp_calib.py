"""Unit mirrors: poisson_bootstrap_means, randomized_response (+ estimator),
source_temperature_sample, calibration_bins."""

from __future__ import annotations

import math
import random

from kgforge.anonymize.privacy import randomized_response, rr_frequency_estimate
from kgforge.datapipe.classify import calibration_bins
from kgforge.datapipe.mix import source_temperature_sample
from kgforge.datapipe.stats import _POIS1_CDF, poisson_bootstrap_means

_MOD = 2147483647


def _poly(s: str, mult: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % _MOD
    return acc


def _stage2_padded_py(s: str) -> int:
    return _poly(str(_poly(s, 1000003)).rjust(10, "0"), 1009)


def _pois_w(u: float) -> int:
    for k, thr in enumerate(_POIS1_CDF):
        if u < thr:
            return k
    return 9


def test_poisson_bootstrap_matches_python_mirror(spark):
    rows = [(f"r{i}", round(10.0 + (i % 7) * 1.25, 2)) for i in range(300)]
    df = spark.createDataFrame(rows, "id string, v double")
    got = {r["b"]: r for r in
           poisson_bootstrap_means(df, "id", "v", n_boot=8).collect()}
    for b in range(8):
        n_eff, s = 0, 0
        for rid, v in rows:
            u = (_stage2_padded_py(f"{rid}:{b}:boot") + 1) / 2147483648.0
            w = _pois_w(u)
            n_eff += w
            s += w * int(round(v * 100))
        assert got[b]["n_eff"] == n_eff
        assert abs(got[b]["mean"] - round(s / n_eff / 100, 6)) <= 1e-6
    # resample means cluster around the true mean
    true_mean = sum(v for _, v in rows) / len(rows)
    means = [got[b]["mean"] for b in range(8)]
    assert all(abs(m - true_mean) < 1.0 for m in means)
    assert len(set(means)) > 1  # replicates differ


def test_randomized_response_mirror_and_debias(spark):
    cats = ["A", "B", "C", "D"]
    rows = [(i, cats[i % 4]) for i in range(2000)]
    df = spark.createDataFrame(rows, "id int, seg string")
    rel = randomized_response(df, "id", "seg", cats, p_true=0.75)
    got = {r["id"]: r["seg"] for r in rel.collect()}
    thr = int(0.75 * 2147483648.0)
    flipped = 0
    for i, true in rows:
        if _stage2_padded_py(f"{i}:rr") < thr:
            want = true
        else:
            want = sorted(cats)[_stage2_padded_py(f"{i}:rr#pick") % 4]
            flipped += 1
        assert got[i] == want
    assert 0 < flipped < 2000
    # debiased estimate recovers ~uniform 0.25 per category
    est = {r["category"]: r["pi_hat"]
           for r in rr_frequency_estimate(rel, "seg", k=4).collect()}
    assert all(abs(est[c] - 0.25) < 0.05 for c in cats)
    assert abs(sum(est.values()) - 1.0) < 1e-6


def test_randomized_response_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "A")], "id int, seg string")
    for bad in (lambda: randomized_response(df, "id", "seg", [], 0.5),
                lambda: randomized_response(df, "id", "seg", ["A"], 0.0)):
        try:
            bad()
        except ValueError:
            pass
        else:
            raise AssertionError("invalid args must raise")


def test_source_temperature_sample_rates(spark):
    # sources with 4:1 size ratio; alpha=0.5 keeps sqrt-flattened shares
    rows = [(f"a{i}", "big") for i in range(4000)] + [
        (f"b{i}", "small") for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id string, src string")
    kept = source_temperature_sample(df, "id", "src", alpha=0.5)
    by = {r["src"]: r["n"] for r in
          kept.groupBy("src").count().withColumnRenamed("count", "n").collect()}
    # binding source (small) keeps ~100%; big keeps ~ (1000/4000)^0.5 = 50%
    assert by["small"] > 950
    assert abs(by["big"] / 4000 - 0.5) < 0.07
    # determinism: same ids survive under any partitioning
    k2 = source_temperature_sample(df.repartition(7), "id", "src", alpha=0.5)
    assert sorted(r["id"] for r in kept.select("id").collect()) == sorted(
        r["id"] for r in k2.select("id").collect()
    )


def test_calibration_bins_mirror(spark):
    rng = random.Random(17)
    rows = []
    for i in range(1500):
        p = round(rng.random(), 4)
        y = rng.random() < p  # perfectly calibrated generator
        rows.append((p, y))
    df = spark.createDataFrame(rows, "p double, y boolean")
    got = {r["bin"]: r for r in calibration_bins(df, "p", "y").collect()}

    agg: dict[int, list[int]] = {}
    sq = 0
    for p, y in rows:
        mu = int(round(p * 1000000))
        b = min(mu * 10 // 1000000, 9)
        a = agg.setdefault(b, [0, 0, 0])
        a[0] += 1
        a[1] += mu
        a[2] += 1 if y else 0
        sq += (mu - (1000000 if y else 0)) ** 2
    brier = round(sq / len(rows) / 1.0e12, 6)
    for b, (n, sp, npos) in agg.items():
        r = got[b]
        assert (r["n"], r["n_pos"]) == (n, npos)
        assert abs(r["mean_pred"] - round(sp / n / 1e6, 6)) <= 1e-6
        assert abs(r["frac_pos"] - round(npos / n, 6)) <= 1e-6
        assert r["brier"] == brier
    # calibrated generator: gaps small, brier near p(1-p) average
    assert all(got[b]["gap"] < 0.12 for b in got)
    assert 0.1 < got[0]["brier"] < 0.25


def test_calibration_bin_edges_are_integer_exact(spark):
    # p exactly on a bin edge must land in the upper bin (floor semantics)
    df = spark.createDataFrame(
        [(0.2, True), (0.199999, False), (1.0, True)], "p double, y boolean"
    )
    got = {r["bin"]: (r["n"], r["n_pos"])
           for r in calibration_bins(df, "p", "y").collect()}
    assert got[2] == (1, 1)   # 0.2 -> bin 2
    assert got[1] == (1, 0)   # 0.199999 -> bin 1
    assert got[9] == (1, 1)   # 1.0 clamps to last bin
