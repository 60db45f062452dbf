"""Deterministic negative sampling for KG-embedding training.

TransE-family training (Bordes et al. 2013) consumes each positive triple
with k corrupted-tail negatives drawn uniformly from the entity set,
minus accidental positives (the "filtered" setting of Toutanova & Chen
2015).  At 10^12 triples the draw must be a pure function of the triple —
not an RNG state — or the training set is unreproducible across retries,
partitionings, and resume-from-checkpoint; so the pick is a two-stage
portable hash of (subj, pred, obj, lane) mod |E|, realized as an equi-join
against a globally-indexed entity table (built with the range-partitioned
rank helper — no single-partition window, no zipWithIndex lineage trap).

Scale shape: one distinct + global rank over entities, one k-way explode
of the triple table, one join on the picked index, one anti-join against
the true triples.  Everything is a pure function of the data: the oracle
reproduces the exact sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.datapipe.sketch import _stage2
from kgforge.rank import with_global_rank

_SEP = ""


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """(subj, pred, obj, lane, neg_obj): up to ``k`` corrupted-tail
    negatives per positive triple, uniformly hash-picked from the entity
    set (subjects ∪ objects) and FILTERED — a corruption that collides
    with any true (subj, pred, ·) triple is dropped, so lanes may come
    back sparse (the standard filtered-setting contract; resample on a
    salted lane if training needs exactly k)."""
    caches: list = []
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).persist()
    try:
        ents = (
            t.select(F.col("s").alias("e"))
            .unionByName(t.select(F.col("o").alias("e")))
            .distinct()
        )
        idx = with_global_rank(ents, ["e"], out="_pick", cleanup=caches)
        n = ents.count()
        lanes = t.select(
            "s", "p", "o",
            F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("lane"),
        )
        cand = lanes.withColumn(
            "_pick",
            _stage2(
                F.concat_ws(_SEP, "s", "p", "o", F.col("lane").cast("string")),
                31,
                1009,
            )
            % n,
        )
        picked = cand.join(
            idx.select("_pick", F.col("e").alias("neg_obj")), "_pick"
        )
        filtered = picked.join(
            t.select(
                F.col("s"), F.col("p"), F.col("o").alias("neg_obj")
            ).distinct(),
            ["s", "p", "neg_obj"],
            "left_anti",
        )
        out = filtered.select(
            F.col("s").alias(subj),
            F.col("p").alias(pred),
            F.col("o").alias(obj),
            "lane",
            "neg_obj",
        )
        return out.localCheckpoint(eager=True)
    finally:
        t.unpersist()
        for c in caches:
            c.unpersist()
