"""Streaming CMS maintenance (streaming.py:stream_cms — streamed registers
≡ batch registers bit-for-bit) and FD discovery (datapipe/profile.py)."""

from __future__ import annotations

import pytest

from kgforge.datapipe.profile import fd_discovery
from kgforge.datapipe.sketch import cms_build
from kgforge.streaming import read_cms, stream_cms


def _reg_map(df):
    return {(r["lane"], r["slot"]): r["c"] for r in df.collect()}


def test_stream_cms_equals_batch_and_replay_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    sketch = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    batches = [
        [("a",), ("b",), ("a",)],
        [("b",), ("c",)],
        [("a",), ("c",), ("c",), ("d",)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "v string").coalesce(1) \
            .write.mode("append" if i else "overwrite").parquet(src)

    q = stream_cms(spark, src, sketch, ckpt, "v string", "v").start()
    assert q.awaitTermination(600), "stream drain timed out"
    streamed = _reg_map(read_cms(spark, sketch))

    full = spark.createDataFrame(
        [r for b in batches for r in b], "v string")
    assert streamed == _reg_map(cms_build(full, "v"))

    # replay: restarting over the same source changes nothing
    q2 = stream_cms(spark, src, sketch, ckpt, "v string", "v").start()
    assert q2.awaitTermination(600), "replay drain timed out"
    assert _reg_map(read_cms(spark, sketch)) == streamed


def test_read_cms_before_first_epoch_is_none(spark, tmp_path):
    assert read_cms(spark, str(tmp_path / "nowhere")) is None


def test_fd_discovery_exact_and_g3(spark):
    rows = [
        (1, "alice", "x"), (2, "bob", "x"), (3, "carol", "y"),
        (4, "dave", "y"), (4, "dave", "y"),          # duplicate row, same FD
        (5, None, "z"), (6, None, "z"),              # NULL lhs is a value
    ]
    df = spark.createDataFrame(rows, "k int, name string, seg string")
    got = {
        (r["lhs"], r["rhs"]): (r["n_rows"], r["n_groups"],
                               r["n_violating_groups"], r["g3_rows"],
                               r["exact"])
        for r in fd_discovery(df, [("k", "name"), ("name", "k"),
                                   ("seg", "name"), ("k", "seg")]).collect()
    }
    # k → name holds exactly (k=4 repeats with the same name)
    assert got[("k", "name")] == (7, 6, 0, 0, True)
    # name → k: NULL-name group carries k=5 and k=6 → one violating group,
    # g3 = 1 row to delete
    assert got[("name", "k")] == (7, 5, 1, 1, False)
    # seg → name: x→{alice,bob}, y→{carol,dave(2)}, z→{None} →
    # two violating groups, g3 = 1 + 1
    assert got[("seg", "name")] == (7, 3, 2, 2, False)
    assert got[("k", "seg")][4] is True


def test_fd_discovery_validates_pairs(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError):
        fd_discovery(df, [])
