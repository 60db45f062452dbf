import random

import pytest
from pyspark.sql import functions as F

from kgforge.datapipe.ivm import aggregate_base, merge_delta


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v bigint")


def _view(df):
    return {
        r["k"]: (r["cnt"], r["sum_v"]) for r in df.collect()
    }


def test_merge_equals_recompute(spark):
    rng = random.Random(1)
    base_rows = [(f"g{rng.randrange(6)}", rng.randrange(100)) for _ in range(300)]
    base = _mk(spark, base_rows)
    view = aggregate_base(base, ["k"], ["v"])

    inserts = [(f"g{rng.randrange(8)}", rng.randrange(100)) for _ in range(80)]
    deletes = random.Random(2).sample(base_rows, 50)
    delta = _mk(spark, inserts).withColumn("_sign", F.lit(1)).unionByName(
        _mk(spark, deletes).withColumn("_sign", F.lit(-1))
    )
    maintained = merge_delta(view, delta, ["k"], ["v"])

    final_rows = list(base_rows)
    for r in deletes:
        final_rows.remove(r)
    final_rows += inserts
    recomputed = aggregate_base(_mk(spark, final_rows), ["k"], ["v"])
    assert _view(maintained) == _view(recomputed)


def test_group_vanishes_and_appears(spark):
    base = _mk(spark, [("a", 1), ("a", 2), ("b", 5)])
    view = aggregate_base(base, ["k"], ["v"])
    delta = (
        _mk(spark, [("a", 1), ("a", 2)]).withColumn("_sign", F.lit(-1))
        .unionByName(_mk(spark, [("c", 9)]).withColumn("_sign", F.lit(1)))
    )
    got = _view(merge_delta(view, delta, ["k"], ["v"]))
    assert got == {"b": (1, 5), "c": (1, 9)}


def test_negative_count_raises(spark):
    base = _mk(spark, [("a", 1)])
    view = aggregate_base(base, ["k"], ["v"])
    delta = _mk(spark, [("zz", 3)]).withColumn("_sign", F.lit(-1))
    with pytest.raises(Exception, match="negative"):
        merge_delta(view, delta, ["k"], ["v"]).collect()


def test_stream_maintain_view_equals_batch(spark, tmp_path):
    """Streamed IVM (chunked signed deltas through foreachBatch epochs)
    lands on exactly the batch merge_delta result over the union delta,
    and replaying an epoch is a no-op (exactly-once marker)."""
    import os

    from pyspark.sql import types as T

    from kgforge.streaming import maintain_view_epoch, read_view, stream_maintain_view

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("_sign", T.IntegerType()),
    ])
    src = str(tmp_path / "delta_in")
    os.makedirs(src)
    rng = random.Random(4)
    chunk1 = [(f"g{rng.randrange(5)}", rng.randrange(50), 1) for _ in range(40)]
    # chunk2 deletes a sample of chunk1 and inserts fresh rows
    deletes = [(k, v, -1) for k, v, _ in random.Random(5).sample(chunk1, 10)]
    inserts = [(f"g{rng.randrange(7)}", rng.randrange(50), 1) for _ in range(20)]
    chunk2 = deletes + inserts
    import glob
    import shutil

    # the file-stream source lists FILES in delta_dir (not nested dirs):
    # stage each chunk then move its part-file in, as a CDC producer would
    for name, rows in (("a", chunk1), ("b", chunk2)):
        stage = str(tmp_path / f"stage_{name}")
        (spark.createDataFrame(rows, "k string, v long, _sign int")
         .coalesce(1).write.parquet(stage))
        [part] = glob.glob(f"{stage}/part-*.parquet")
        shutil.move(part, f"{src}/chunk_{name}.parquet")

    view_dir = str(tmp_path / "view")
    q = stream_maintain_view(
        spark, src, view_dir, str(tmp_path / "ckpt"), schema, ["k"], ["v"],
    ).start()
    q.processAllAvailable()
    q.stop()

    got = _view(read_view(spark, view_dir))

    alive = [(k, v) for k, v, _ in chunk1 + inserts]
    for k, v, _ in deletes:
        alive.remove((k, v))
    want = _view(aggregate_base(_mk(spark, alive), ["k"], ["v"]))
    assert got == want

    # replaying an already-committed epoch is a no-op
    replay = spark.createDataFrame(chunk2, "k string, v long, _sign int")
    assert maintain_view_epoch(replay, 0, view_dir, ["k"], ["v"]) is False
    assert _view(read_view(spark, view_dir)) == want
