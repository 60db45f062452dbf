"""Column anonymization operators as DataFrame transforms.

Each operator consumes one attribute's column vector ``(subj, obj_value, ...)``
and returns NEW triples to union into the graph (the reference mutates its
Jena model in place — Masking.java:19-25, Generalization.java:59-62,
Randomization.java:72-75; we rebuild immutably).

Scale notes are inline: generalization uses a range-partitioned global rank
(never a single-partition window); randomization's sequential RNG contract
forces one task per attribute in fixture-parity mode (attributes run in
parallel — independent seeded streams per attribute, RandomizationNumeric.java:22),
with a documented partition-parallel scale mode.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.anonymize.values import (
    format_bound,
    format_randomized,
    median_value,
    parse_col,
)
from kgforge.javarandom import JavaRandom, java_math_round
from kgforge.rank import with_global_rank
from kgforge.triples import (
    RDF_MAX,
    RDF_MIN,
    RDF_TYPE,
    RDFS_COMMENT,
    SOYA_URL,
    TRIPLE_SCHEMA,
    triples_df,
)

MASK = "*****"
OBFUSCATED_LOWER = "For the lower bound the minimum value is obfuscated"
OBFUSCATED_UPPER = "For the higher bound the maximum value is obfuscated"


def mask(col_df: DataFrame, attr: str) -> DataFrame:
    """Masking (reference: Masking.java:19-25): constant '*****' per non-null."""
    return col_df.select(
        F.col("subj"),
        F.lit(attr + "_masked").alias("pred"),
        F.lit(MASK).alias("obj_value"),
        F.lit("string").alias("obj_dtype"),
        F.lit(False).alias("obj_is_iri"),
    )


def generalize(
    col_df: DataFrame,
    attr: str,
    datatype: str,
    g: int,
    n: int,
    order_col=None,
) -> DataFrame:
    """Equal-frequency generalization (reference: Generalization.java:30-104).

    bucket(i) = g*i/k (int arithmetic — NOT ntile, which distributes
    remainders differently); bucket b bounds are means of the sorted values
    adjacent to indices b*k/g and (b+1)*k/g - 1; edge buckets obfuscate the
    outer bound.  The global rank is computed with range partitioning +
    partition offsets (kgforge.rank) so the sort scales; only the ≤4g
    boundary-adjacent values are collected to the driver (g ≈ √k).
    """
    spark = col_df.sparkSession
    d = col_df.withColumn("_v", parse_col(datatype, F.col("obj_value")))
    tiebreak = order_col if order_col is not None else F.col("subj")
    ranked = with_global_rank(d, [F.col("_v"), tiebreak], out="_rank").persist()

    # boundary-adjacent sorted indices for all g buckets
    idx: set[int] = set()
    for b in range(g):
        lb = b * n // g
        ub = (b + 1) * n // g - 1
        idx.update(x for x in (lb - 1, lb, ub, ub + 1) if 0 <= x < n)
    vals = {
        r["_rank"]: r["_v"]
        for r in ranked.filter(F.col("_rank").isin(list(idx))).select("_rank", "_v").collect()
    }

    bucket_rows: list[tuple] = []
    for b in range(g):
        bucket_iri = f"{attr}_{b}"
        # reference addProperty(RDF.type, String) stores the type as a *string
        # literal* (Generalization.java:75)
        bucket_rows.append((bucket_iri, RDF_TYPE, SOYA_URL + "generalization", "string", False))
        lb = b * n // g
        ub = (b + 1) * n // g - 1
        lower = median_value(datatype, vals.get(lb - 1), vals[lb])
        upper = median_value(datatype, vals[ub], vals.get(ub + 1))
        if b != 0:
            lex, dt = format_bound(datatype, lower)
            bucket_rows.append((bucket_iri, RDF_MIN, lex, dt, False))
        else:
            bucket_rows.append((bucket_iri, RDFS_COMMENT, OBFUSCATED_LOWER, "string", False))
        if b != g - 1:
            lex, dt = format_bound(datatype, upper)
            bucket_rows.append((bucket_iri, RDF_MAX, lex, dt, False))
        else:
            bucket_rows.append((bucket_iri, RDFS_COMMENT, OBFUSCATED_UPPER, "string", False))

    # bucket(i) = g*i/k in integer arithmetic (Generalization.java:50)
    bucket_id = F.expr(f"CAST({g} AS BIGINT) * _rank DIV {n}")
    assign = ranked.select(
        F.col("subj"),
        F.lit(attr + "_generalized").alias("pred"),
        F.concat(F.lit(attr + "_"), bucket_id.cast("string")).alias("obj_value"),
        F.lit("iri").alias("obj_dtype"),
        F.lit(True).alias("obj_is_iri"),
    )
    return assign.unionByName(triples_df(spark, bucket_rows))


def generalize_object(
    triples: DataFrame,
    col_df: DataFrame,
    attr: str,
    attr_order: tuple[str, ...],
    g: int,
    n: int,
    hier_prefix: str,
) -> DataFrame:
    """Hierarchy generalization (reference: GeneralizationObject.java:27-58).

    Walk the attributeOrder ladder low→high; first level whose value groups
    satisfy (#groups ≤ g AND min group count > 0.5·n/g) wins; otherwise mask.
    Sub-property IRIs are hardcoded under the demo prefix
    (GeneralizationObject.java:31 — quirk preserved via hier_prefix).
    """
    gen_pred = attr + "_generalized"
    refs = col_df.select("subj", F.col("obj_value").alias("_ref"))
    for level in attr_order:
        level_pred = hier_prefix + level
        child = (
            triples.filter((F.col("pred") == level_pred) & (~F.col("obj_is_iri")))
            .select(F.col("subj").alias("_ref"), F.col("obj_value").alias("_lv"))
            .dropDuplicates(["_ref"])
        )
        vals = refs.join(F.broadcast(child), "_ref", "left").select(
            "subj", F.coalesce(F.col("_lv"), F.lit("")).alias("val")
        )
        stats = (
            vals.groupBy("val")
            .count()
            .agg(F.count(F.lit(1)).alias("ngroups"), F.min("count").alias("mincnt"))
            .collect()[0]
        )
        if stats["ngroups"] <= g and stats["mincnt"] > n * 0.5 / g:
            return vals.select(
                "subj",
                F.lit(gen_pred).alias("pred"),
                F.col("val").alias("obj_value"),
                F.lit("string").alias("obj_dtype"),
                F.lit(False).alias("obj_is_iri"),
            )
    return col_df.select(
        "subj",
        F.lit(gen_pred).alias("pred"),
        F.lit(MASK).alias("obj_value"),
        F.lit("string").alias("obj_dtype"),
        F.lit(False).alias("obj_is_iri"),
    )


def _draw_numeric(rng: JavaRandom, v: float, dist: float, vmin: float, vmax: float) -> float:
    # RandomizationNumeric.java:30-40 — uniform noise, reflect, re-draw loop
    rv = float("inf")
    while rv > vmax or rv < vmin:
        noise = rng.next_double() * dist
        cand = v + noise
        rv = v - noise if (cand > vmax or cand < vmin) else cand
    return rv


def _draw_date(rng: JavaRandom, day: int, dist: float, dmin: int, dmax: int) -> int:
    # RandomizationDate.java:40-58 — gaussian days, negate-if-out, re-draw
    noise = 2**31 - 1
    while day + noise > dmax or day + noise < dmin:
        noise = int(java_math_round(rng.next_gaussian() * dist))
        if day + noise > dmax or day + noise < dmin:
            noise = -noise
    return day + noise


def _draw_datetime(rng: JavaRandom, sec: int, dist: float, smin: int, smax: int) -> int:
    # RandomizationDateTime.java:36-51 — gaussian seconds, (int) truncation
    noise = 2**31 - 1
    while sec + noise > smax or sec + noise < smin:
        noise = int(rng.next_gaussian() * dist)  # Java (int) cast truncates
        if sec + noise > smax or sec + noise < smin:
            noise = -noise
    return sec + noise


def randomize(
    col_df: DataFrame,
    attr: str,
    datatype: str,
    g: int,
    n: int,
    seed: int,
    order_col=None,
    mode: str = "exact",
) -> DataFrame:
    """Adaptive-noise randomization (reference: Randomization.java:27-59 +
    per-datatype draws).

    Window size rv = n/g (n-1 if rv == n); for each sorted value, a two-pointer
    pass finds the closest contiguous (rv+1)-window and the noise scale is the
    max distance to its ends.  Draws come from ONE java.util.Random(seed)
    stream consumed in ascending-value order with data-dependent retry loops —
    inherently sequential per attribute (RandomizationNumeric.java:22,
    fixtures pin seed=1234).  mode="exact" runs the attribute as a single
    applyInPandas group (attributes parallelize across tasks); mode
    ="partitioned" range-partitions and seeds each partition with seed ⊕ pid —
    a documented semantic extension for corpus scale.
    """
    d = col_df.withColumn("_v", parse_col(datatype, F.col("obj_value")))
    tiebreak = order_col if order_col is not None else F.col("subj")
    d = d.withColumn("_ord", tiebreak.cast("string"))

    def run_group(pdf: pd.DataFrame, seed_: int) -> pd.DataFrame:
        pdf = pdf.sort_values(["_v", "_ord"], kind="mergesort").reset_index(drop=True)
        vals = pdf["_v"].to_numpy()
        k = len(vals)
        if k == 0:
            return pd.DataFrame({"subj": [], "obj_value": []})
        rng = JavaRandom(seed_)
        vmin, vmax = vals[0], vals[-1]
        # window size from the group's own size (Randomization.java:29,37);
        # in exact mode the group IS the whole column, so this equals n/g
        rvv = k // g
        if rvv == k:
            rvv -= 1
        out = []
        lower = 0
        for idx in range(k):
            v = vals[idx]
            while lower < k - (rvv + 1) and (
                lower < idx - rvv
                or abs(vals[lower] - v) > abs(vals[lower + rvv + 1] - v)
            ):
                lower += 1
            dist = max(abs(vals[lower] - v), abs(vals[lower + rvv] - v))
            if datatype in ("integer", "double"):
                res = _draw_numeric(rng, float(v), float(dist), float(vmin), float(vmax))
            elif datatype == "date":
                res = _draw_date(rng, int(v), float(dist), int(vmin), int(vmax))
            else:
                res = _draw_datetime(rng, int(v), float(dist), int(vmin), int(vmax))
            out.append(format_randomized(datatype, res)[0])
        return pd.DataFrame({"subj": pdf["subj"], "obj_value": out})

    dtype = format_randomized(datatype, 0)[1]
    if mode == "partitioned":
        npart = max(d.sparkSession.sparkContext.defaultParallelism, 1)
        from pyspark import TaskContext

        def run_part(it):
            pid = TaskContext.get().partitionId()
            pdf = pd.concat(list(it)) if it else pd.DataFrame()
            frames = [pdf] if len(pdf) else []
            for f_ in frames:
                yield run_group(f_, seed ^ pid)

        randomized = (
            d.repartitionByRange(npart, "_v", "_ord")
            .mapInPandas(run_part, schema="subj string, obj_value string")
        )
    else:
        randomized = (
            d.withColumn("_grp", F.lit(1))
            .groupBy("_grp")
            .applyInPandas(
                lambda pdf: run_group(pdf, seed),
                schema="subj string, obj_value string",
            )
        )
    return randomized.select(
        "subj",
        F.lit(attr + "_randomized").alias("pred"),
        "obj_value",
        F.lit(dtype).alias("obj_dtype"),
        F.lit(False).alias("obj_is_iri"),
    )
