"""Deterministic k-hop neighbor sampling (GraphSAGE fan-out).

GNN mini-batch training needs, for every seed node, a bounded
computation graph: at layer l keep at most ``fanout[l]`` neighbors per
frontier node (Hamilton et al. 2017).  Random sampling breaks
reproducibility across retries and partitionings, so the pick here is
hash-ranked: neighbor order is the portable two-stage polynomial hash of
(seed, src, dst, layer), making the sample a pure function of the data —
the same property the random-walk corpus and negative-sampling operators
in this repo rely on.

Scale shape: each layer is one frontier⋈edges join plus a per-(seed,
src) top-k window — Spark plans the rank filter as WindowGroupLimit, so
hub nodes are cut to the fan-out map-side before the shuffle instead of
materializing their full adjacency per seed.  Frontiers are distinct
(seed, node) pairs, so repeated reaches of a node within one seed's
neighborhood are expanded once per layer, not once per path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgforge.datapipe.sketch import _stage2


def neighbor_sample(
    edges: DataFrame,
    seeds,
    fanouts: list[int],
    directed: bool = True,
) -> DataFrame:
    """Sampled computation-graph edges ``(seed, layer, src, dst)`` for
    every seed: layer 0 edges leave the seeds, layer l edges leave the
    distinct nodes reached at layer l-1, each frontier node keeping its
    ``fanouts[l]`` lowest-hash neighbors (ties on dst).

    ``seeds`` is a DataFrame (first column) or an iterable of ids;
    ``fanouts`` must be non-empty positive ints."""
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError("fanouts must be non-empty positive ints")
    spark = edges.sparkSession
    e = edges.select(
        F.col("src").cast("string"), F.col("dst").cast("string")
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.filter(F.col("src") != F.col("dst")).distinct()
    e = e.localCheckpoint(eager=True)

    if isinstance(seeds, DataFrame):
        sd = seeds.select(
            F.col(seeds.columns[0]).cast("string").alias("seed")
        )
    else:
        sd = spark.createDataFrame([(str(s),) for s in seeds], "seed string")
    frontier = sd.distinct().withColumn("node", F.col("seed"))

    layers = []
    for layer, f in enumerate(fanouts):
        cand = frontier.join(e, frontier["node"] == e["src"]).select(
            "seed",
            "src",
            "dst",
            _stage2(
                F.concat_ws(
                    "\x1f",
                    F.col("seed"),
                    F.col("src"),
                    F.col("dst"),
                    F.lit(str(layer)),
                ),
                31,
                1009,
            ).alias("_h"),
        )
        w = Window.partitionBy("seed", "src").orderBy("_h", "dst")
        pick = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= f)
            .select("seed", "src", "dst")
            .localCheckpoint(eager=True)
        )
        layers.append(
            pick.select(
                "seed", F.lit(layer).alias("layer"), "src", "dst"
            )
        )
        frontier = pick.select("seed", F.col("dst").alias("node")).distinct()

    out = layers[0]
    for d in layers[1:]:
        out = out.unionByName(d)
    return out
