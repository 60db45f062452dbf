"""Python mirrors for perceptual dHash over real P6 decode
(datapipe/multimodal.py: ppm_dhash / image_dup_groups)."""

from __future__ import annotations

from kgforge.datapipe.multimodal import (
    image_dup_groups,
    ppm_dhash,
    synth_ppm_payloads,
)


def _py_dhash(seed: int) -> tuple[int, int, int]:
    w, h = 8 + seed % 8, 6 + seed % 6

    def byte(j):
        return (seed * 37 + j * 101) % 256

    def bright(y, x):
        p = (y * w + x) * 3
        return byte(p) + byte(p + 1) + byte(p + 2)

    ys = [(i * h) // 8 for i in range(8)]
    xs = [(j * w) // 8 for j in range(8)]
    hv = 0
    for i in range(8):
        for j in range(7):
            if bright(ys[i], xs[j]) > bright(ys[i], xs[j + 1]):
                hv |= 1 << (i * 7 + j)
    return w, h, hv


def test_ppm_dhash_matches_formula_mirror(spark):
    ids = spark.createDataFrame([(3,), (10,), (27,)], "doc_id long")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["dhash"])
        for r in ppm_dhash(synth_ppm_payloads(ids)).collect()
    }
    for d in (3, 10, 27):
        assert got[d] == _py_dhash(d)
    # 56-bit key stays a positive int64
    assert all(0 <= v[2] < 1 << 56 for v in got.values())


def test_seeded_payloads_make_exact_dup_groups(spark):
    rows = [(i, i % 3) for i in range(12)]
    ids = spark.createDataFrame(rows, "doc_id long, seed long")
    hashed = ppm_dhash(synth_ppm_payloads(ids, seed_col="seed"))
    groups = sorted(
        (r["n_items"], r["ids"]) for r in image_dup_groups(hashed).collect()
    )
    assert len(groups) == 3
    assert groups[0] == (4, [0, 3, 6, 9])
    assert all(n == 4 for n, _ in groups)
    # each group's hash equals the formula hash of its seed
    by_hash = {r["dhash"]: r["ids"] for r in image_dup_groups(hashed).collect()}
    for seed in range(3):
        assert by_hash[_py_dhash(seed)[2]] == [seed, seed + 3, seed + 6, seed + 9]
