"""Unit mirrors for the multi-image P6 stream: synth_ppm_stream container
bytes and sample_stream_frames decode-every-kth."""

from __future__ import annotations

from kgforge.datapipe.multimodal import (
    _walk_ppm_frame,
    sample_stream_frames,
    synth_ppm_stream,
)


def _frame_sums(seed: int, f: int) -> tuple[int, int, int]:
    w, h = 8 + seed % 8, 6 + seed % 6
    sums = [0, 0, 0]
    for j in range(w * h * 3):
        sums[j % 3] += (seed * 37 + f * 13 + j * 101) % 256
    return tuple(sums)


def test_stream_frames_match_formula_mirror(spark):
    ids = spark.createDataFrame([(i,) for i in range(21)], "doc_id long")
    streams = synth_ppm_stream(ids)
    got = {
        (r["doc_id"], r["frame_idx"]): r
        for r in sample_stream_frames(streams, every=2).collect()
    }
    expected_keys = set()
    for i in range(21):
        nf = 2 + i % 4
        for f in range(0, nf, 2):
            expected_keys.add((i, f))
            r = got[(i, f)]
            assert r["n_frames"] == nf
            assert (r["width"], r["height"]) == (8 + i % 8, 6 + i % 6)
            assert (r["sum_r"], r["sum_g"], r["sum_b"]) == _frame_sums(i, f)
    assert set(got) == expected_keys


def test_stream_container_is_real_concatenated_p6(spark):
    ids = spark.createDataFrame([(7,)], "doc_id long")
    payload = bytes(synth_ppm_stream(ids).collect()[0]["payload"])
    # walk all frames by header-declared raster lengths; must consume exactly
    pos, frames = 0, 0
    while pos < len(payload):
        w, h, maxval, raster_at, end = _walk_ppm_frame(payload, pos)
        assert payload[pos : pos + 2] == b"P6" and maxval == 255
        assert (w, h) == (8 + 7 % 8, 6 + 7 % 6)
        pos, frames = end, frames + 1
    assert frames == 2 + 7 % 4 and pos == len(payload)


def test_walk_rejects_truncated_and_foreign_payloads():
    try:
        _walk_ppm_frame(b"P6\n4 4\n255\nshort", 0)
    except ValueError as e:
        assert "truncated" in str(e)
    else:
        raise AssertionError("truncated raster must raise")
    try:
        _walk_ppm_frame(b"JFIF....", 0)
    except ValueError:
        pass
    else:
        raise AssertionError("non-P6 magic must raise")
