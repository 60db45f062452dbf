"""REAL PNG codec (multimodal.py): stdlib-zlib encode/decode round-trip
over all five scanline filter types, CRC enforcement, and cross-format
parity with the PPM path (same raster ⇒ same stats, same dhash)."""

import pytest
from pyspark.sql import functions as F

from kgforge.datapipe.multimodal import (
    _encode_png,
    _parse_png,
    decode_png,
    decode_ppm,
    png_dhash,
    ppm_dhash,
    synth_png_payloads,
    synth_ppm_payloads,
)


def _raster(seed: int):
    w, h = 8 + seed % 8, 6 + seed % 6
    return w, h, bytes((seed * 37 + j * 101) % 256 for j in range(w * h * 3))


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter_type(ft):
    w, h, raster = _raster(11)
    data = _encode_png(w, h, raster, filter_of_row=lambda y: ft)
    rw, rh, maxval, out = _parse_png(data)
    assert (rw, rh, maxval) == (w, h, 255)
    assert out == raster


def test_roundtrip_rotating_filters():
    # default per-row rotation: every filter appears in one image
    for seed in range(10):
        w, h, raster = _raster(seed)
        assert _parse_png(_encode_png(w, h, raster))[3] == raster


def test_crc_corruption_raises():
    w, h, raster = _raster(3)
    data = bytearray(_encode_png(w, h, raster))
    data[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(data))


def test_not_a_png_raises():
    with pytest.raises(ValueError, match="not a PNG"):
        _parse_png(b"P6\n2 2\n255\n" + bytes(12))


def test_png_ppm_stats_parity(spark):
    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    png = decode_png(synth_png_payloads(ids)).collect()
    ppm = decode_ppm(synth_ppm_payloads(ids)).collect()
    assert sorted(map(tuple, png)) == sorted(map(tuple, ppm))


def test_png_ppm_dhash_parity(spark):
    ids = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("seed")
    )
    png = png_dhash(synth_png_payloads(ids, seed_col="seed")).collect()
    ppm = ppm_dhash(synth_ppm_payloads(ids, seed_col="seed")).collect()
    assert sorted(map(tuple, png)) == sorted(map(tuple, ppm))
    # planted duplicates: seeds repeat every 7 ids ⇒ ≤7 distinct hashes
    assert len({r["dhash"] for r in png}) <= 7
