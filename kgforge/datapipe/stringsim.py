"""Edit-distance similarity self-join (PassJoin-style segment blocking).

Finds all pairs of strings within Levenshtein distance ``d`` without a
pair set: the pigeonhole principle says ``d`` edit operations can touch at
most ``d`` of ``d+1`` contiguous segments, so one segment of every true
match survives VERBATIM in the other string, shifted by at most ``d``
positions (Li, Deng & Feng, PassJoin, VLDB 2012 — public algorithm).

Scale shape: the index side emits ``d+1`` segments per string; the probe
side emits one substring per (segment index, length delta, shift) — at
most ``(d+1)·(2d+1)²`` short probes per string, constant in corpus size.
Candidates come from one equi-join on (segment index, candidate length,
content); only candidates are verified with the built-in JVM
``levenshtein`` (never Python).  Everything is whole-stage codegen:
substring generation is `transform` over a bounded `sequence`.

Strings shorter than ``d+1`` characters cannot be segmented (an empty
segment matches everything); they are matched through a short-string
brute join whose side is bounded by the distinct strings of length
``<= d`` — a constant-size set for any fixed alphabet.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All unordered pairs (a, b, dist) with
    ``levenshtein(text_a, text_b) <= max_dist`` and ``id_a < id_b``.

    Exact (no false positives — every candidate is verified — and no
    false negatives — the segment filter is pigeonhole-complete).  Ids
    must be unique; duplicate texts under different ids are reported as
    distance-0 pairs."""
    d = int(max_dist)
    if d < 0:
        raise ValueError("max_dist must be >= 0")
    s = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).cast("string").alias("_t"),
    ).filter(F.col("_t").isNotNull())
    s = s.withColumn("_len", F.length("_t")).persist()
    try:
        long_s = s.filter(F.col("_len") >= d + 1)

        # index side: d+1 segments per string, keyed by (idx, own length)
        seg_cols = []
        for i in range(d + 1):
            st = F.expr(f"CAST((_len * {i}) div {d + 1} AS INT)")
            en = F.expr(f"CAST((_len * {i + 1}) div {d + 1} AS INT)")
            seg_cols.append(
                F.struct(
                    F.lit(i).alias("i"),
                    F.col("_t").substr(st + 1, en - st).alias("seg"),
                    st.alias("pos"),
                )
            )
        idx = long_s.select(
            F.col("_id").alias("_ida"),
            F.col("_len").alias("_la"),
            F.explode(F.array(*seg_cols)).alias("sg"),
        ).select(
            "_ida", "_la", F.col("sg.i").alias("i"),
            F.col("sg.seg").alias("seg"), F.col("sg.pos").alias("pos"),
        )

        # probe side: for each candidate source length la = len +/- delta
        # and segment index i, every substring of the segment's length at
        # positions within +/- d of its canonical start
        def _probe_fn(i, la, sl):
            def fn(p):
                return F.struct(
                    F.lit(i).alias("i"),
                    la.cast("long").alias("la"),
                    F.col("_t").substr(p + 1, sl).alias("seg"),
                )

            return fn

        probes = []
        for i in range(d + 1):
            for delta in range(-d, d + 1):
                la = F.col("_len") + delta
                st = F.expr(
                    f"CAST(((_len + {delta}) * {i}) div {d + 1} AS INT)"
                )
                en = F.expr(
                    f"CAST(((_len + {delta}) * {i + 1}) div {d + 1} AS INT)"
                )
                sl = en - st
                lo = F.greatest(F.lit(0), st - d)
                hi = F.least(F.col("_len") - sl, st + d)
                probes.append(
                    F.when(
                        (la >= d + 1) & (sl >= 1) & (lo <= hi),
                        F.transform(
                            F.sequence(lo, hi), _probe_fn(i, la, sl)
                        ),
                    ).otherwise(F.array().cast(
                        "array<struct<i:int,la:long,seg:string>>"
                    ))
                )
        prb = s.select(
            F.col("_id").alias("_idb"),
            F.col("_t").alias("_tb"),
            F.explode(F.flatten(F.array(*probes))).alias("pr"),
        ).select(
            "_idb", "_tb", F.col("pr.i").alias("i"),
            F.col("pr.la").alias("la"), F.col("pr.seg").alias("seg"),
        )

        cand = (
            idx.join(
                prb,
                (idx["i"] == prb["i"])
                & (idx["seg"] == prb["seg"])
                & (idx["_la"] == prb["la"])
                & (idx["_ida"] < prb["_idb"]),
            )
            .select(F.col("_ida").alias("a"), F.col("_idb").alias("b"))
            .distinct()
        )

        # short strings (< d+1 chars): brute within the short band
        short_s = s.filter(F.col("_len") <= d)
        sa = short_s.select(
            F.col("_id").alias("a"), F.col("_t").alias("_sta")
        )
        sb = s.filter(F.col("_len") <= 2 * d).select(
            F.col("_id").alias("b"), F.col("_t").alias("_stb")
        )
        short_cand = (
            sa.join(sb, F.col("a") < F.col("b"))
            .filter(F.levenshtein("_sta", "_stb") <= d)
            .select("a", "b")
        )
        # mirror: short probe against longer strings is covered because
        # pairs need |len diff| <= d, so the longer side has len <= 2d
        short_rev = (
            s.filter(F.col("_len") <= 2 * d)
            .select(F.col("_id").alias("a"), F.col("_t").alias("_sta"))
            .join(
                short_s.select(
                    F.col("_id").alias("b"), F.col("_t").alias("_stb")
                ),
                F.col("a") < F.col("b"),
            )
            .filter(F.levenshtein("_sta", "_stb") <= d)
            .select("a", "b")
        )

        ta = s.select(F.col("_id").alias("a"), F.col("_t").alias("_ta"))
        tb = s.select(F.col("_id").alias("b"), F.col("_t").alias("_tb2"))
        verified = (
            cand.join(ta, "a")
            .join(tb, "b")
            .withColumn("dist", F.levenshtein("_ta", "_tb2"))
            .filter(F.col("dist") <= d)
            .select("a", "b", "dist")
        )
        out = reduce(
            DataFrame.unionByName,
            [
                verified,
                short_cand.join(ta, "a").join(tb, "b").select(
                    "a", "b", F.levenshtein("_ta", "_tb2").alias("dist")
                ),
                short_rev.join(ta, "a").join(tb, "b").select(
                    "a", "b", F.levenshtein("_ta", "_tb2").alias("dist")
                ),
            ],
        ).distinct()
        return out.localCheckpoint(eager=True)
    finally:
        s.unpersist()
