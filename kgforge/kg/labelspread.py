"""Seeded label spreading (transductive semi-supervised classification):
seed nodes carry fixed labels; each synchronous round, every non-seed node
adopts the majority label among its currently-labeled neighbors, ties
broken (count DESC, label ASC) — the deterministic hard-label variant of
Zhu & Ghahramani (2002) harmonic propagation, the same vote machinery as
unseeded LPA (kg/communities.py) but with clamped seeds and label
recomputation from scratch each round (no self-reinforcing drift: round t
depends only on round t−1's labeling).

Scale: per round, ONE equi-join of the oriented edge list against the
current labeling + one map-side-combinable vote groupBy + one per-node
argmax window (WindowGroupLimit pushes it partially map-side), lineage
flattened with localCheckpoint.  Hot nodes cost their own degree; label
count bounds the vote table.  Rounds are the label horizon — r rounds
reach r hops from the seed set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_spread(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    rounds: int = 3,
) -> DataFrame:
    """(node, label, is_seed) — ``label`` NULL for nodes no labeled mass
    reached within ``rounds``.  ``edges`` is an undirected simple edge
    list (either orientation); ``seeds`` is (node, label)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint(eager=True)
    nodes = e.select(F.col("u").alias("node")).distinct()
    sd = seeds.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("label")
    ).localCheckpoint(eager=True)
    lab = sd
    wv = Window.partitionBy("node").orderBy(F.desc("votes"), F.asc("label"))
    for _ in range(rounds):
        votes = (
            e.join(
                lab.select(F.col("node").alias("v"), "label"), "v"
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("votes"))
        )
        adopted = (
            votes.join(sd.select("node"), "node", "left_anti")
            .withColumn("_r", F.row_number().over(wv))
            .filter(F.col("_r") == 1)
            .select("node", "label")
        )
        lab = sd.unionByName(adopted).localCheckpoint(eager=True)
    return (
        nodes.unionByName(sd.select("node")).distinct()
        .join(lab, "node", "left")
        .join(
            sd.select("node", F.lit(True).alias("_s")), "node", "left"
        )
        .select(
            "node", "label", F.coalesce(F.col("_s"), F.lit(False)).alias("is_seed")
        )
    )
