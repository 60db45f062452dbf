"""Mergeable summary sketches: HyperLogLog distinct counts, count-min
heavy hitters.

At 100 TB, exact per-group `COUNT(DISTINCT x)` and global top-k by value
are shuffle monsters; the streaming-sketch answers (Flajolet et al. 2007
HyperLogLog; Cormode & Muthukrishnan 2005 count-min) reduce both to
fixed-size register tables that are associative/commutative — map-side
combinable, union-mergeable across partitions, days, and clusters, which
is the actual production reason to sketch (merge yesterday's registers
with today's without rescanning either).

Hashing is a TWO-STAGE engine-portable fold: the repo's polynomial
char-fold (``kgforge.datapipe.dedup.poly_hash``) is linear in the input
characters, and its raw low/high bits are measurably non-uniform on
sequential keys (444/512 buckets covered where uniform fills all 512 —
enough bias to read HLL 40-90% low).  Re-folding the DECIMAL DIGITS of
the first hash through a second polynomial breaks the linearity (digit
extraction is non-linear over the field) and restores uniformity
(512/512, HLL error back inside its 1.04/√m envelope) — while staying
bit-reproducible in DuckDB (`CAST(h AS VARCHAR)` + the same char fold).
Every register value — and therefore every estimate — is mirrored
exactly by the SQL oracle: the approximation is deterministic, only its
ERROR vs truth is probabilistic.  Float folds run over sorted register
arrays; the only non-dyadic op is the small-range ``ln`` correction,
absorbed by round-6 like every other ln in this repo.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.datapipe.dedup import poly_hash

_HLL_W = 30  # geometric-tail width: stage-2 lane is uniform in [0, 2^31-1)


def _stage2(col, mult1: int, mult2: int):
    """Two-stage portable hash: char-fold with ``mult1``, then char-fold
    the decimal digits of the result with ``mult2``."""
    return poly_hash(poly_hash(col, mult1).cast("string"), mult2)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 9,
) -> DataFrame:
    """The mergeable HLL state: ``(*group_cols, _bucket, _r)`` register
    maxima, ≤ 2**p rows per group regardless of input size.  This is the
    artifact you PERSIST at 100 TB — estimates for any coarser grouping
    come from :func:`hll_merge_registers` + :func:`hll_estimate_registers`
    without rescanning the facts (register max is associative/commutative,
    the defining HLL property)."""
    if not 7 <= p <= 16:
        raise ValueError("p must be in [7, 16]")
    m = 1 << p
    s = F.col(value_col).cast("string")
    with_h = df.select(
        *group_cols,
        (_stage2(s, 31, 1009) % m).alias("_bucket"),
        _stage2(s, 131, 10007).alias("_rl"),
    )
    rho = F.when(
        F.col("_rl") > 0,
        F.length(F.conv(F.expr("_rl & -_rl"), 10, 2)),
    ).otherwise(F.lit(_HLL_W + 1))
    return (
        with_h.select(*group_cols, "_bucket", rho.alias("_rho"))
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_r"))
    )


def hll_merge_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Re-aggregate register tables to a coarser grouping: one map-side-
    combinable max — the rollup path that replaces a 100-TB rescan."""
    return regs.groupBy(*group_cols, "_bucket").agg(
        F.max("_r").alias("_r")
    )


def hll_estimate_registers(
    regs: DataFrame, group_cols: list[str], p: int = 9
) -> DataFrame:
    """Registers → ``(*group_cols, present, est)`` via the standard
    bias-corrected harmonic mean + small-range linear counting."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("present"),
        F.array_sort(F.collect_list(F.struct("_bucket", "_r"))).alias("_regs"),
    )
    sum_present = F.aggregate(
        "_regs",
        F.lit(0.0),
        lambda acc, e: acc
        + F.lit(1.0)
        / F.call_function("shiftleft", F.lit(1).cast("long"), e["_r"]),
    )
    harm = sum_present + (F.lit(m) - F.col("present")).cast("double")
    raw = F.lit(alpha * m * m) / harm
    zeros = F.lit(m) - F.col("present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per.select(*group_cols, "present", est.alias("est"))


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 9,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate: ``(*group_cols, present,
    est)`` with ``m = 2**p`` registers (p in [7, 16]; standard error
    ~1.04/√m ≈ 4.6% at p=9, observed ≤ ~7% on adversarially-sequential
    keys).

    Register build is ONE map-side-combinable max-groupBy on
    (group, bucket) — ≤ m rows per group regardless of input size — then
    one fold per group for the harmonic mean.  ``bucket`` and ``rho``
    come from independent two-stage lanes (31→1009 and 131→10007);
    ``rho`` is the little-endian run length (count of trailing zeros + 1)
    of the second lane, the classic geometric observable.  ``present``
    (non-zero registers) is exposed because it drives the small-range
    linear-count correction and is the piece to monitor for saturation."""
    return hll_estimate_registers(
        hll_registers(df, group_cols, value_col, p), group_cols, p
    )


def _poly_sql(col: str, mult: int) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split_regex({col}, ''), "
        "c -> CAST(ord(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {mult} + x) % 2147483647)"
    )


def _stage2_sql(col: str, mult1: int, mult2: int) -> str:
    return _poly_sql(f"CAST({_poly_sql(col, mult1)} AS VARCHAR)", mult2)


def hll_oracle_sql(
    source_sql: str, group_cols: list[str], value_expr: str, p: int = 9
) -> str:
    """DuckDB mirror of :func:`hll_distinct` over ``source_sql`` (a query
    producing the grouping columns and ``value_expr``) — same two-stage
    hash, same registers, same fold, same correction.  Returns a CTE body
    (caller wraps with WITH and appends its own SELECT if needed)."""
    m = 1 << p
    w = _HLL_W
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gc = ", ".join(group_cols)
    return f"""
src AS MATERIALIZED ({source_sql}),
hh AS MATERIALIZED (
  SELECT {gc},
         {_stage2_sql(value_expr, 31, 1009)} % {m} AS bucket,
         {_stage2_sql(value_expr, 131, 10007)} AS rl
  FROM src
),
reg AS MATERIALIZED (
  SELECT {gc}, bucket,
         max(CASE WHEN rl > 0 THEN length(bin(rl & -rl))
                  ELSE {w + 1} END) AS r
  FROM hh GROUP BY ALL
),
per AS MATERIALIZED (
  SELECT {gc}, CAST(count(*) AS BIGINT) AS present,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(list(r ORDER BY bucket),
             x -> 1.0 / CAST(1::BIGINT << x AS DOUBLE))),
           (a, b) -> a + b) AS sum_present
  FROM reg GROUP BY {gc}
)
SELECT {gc}, present,
       round(CASE WHEN {alpha * m * m} / (sum_present + ({m} - present))
                       <= {2.5 * m}
                  AND {m} - present > 0
             THEN {float(m)} * ln({float(m)} / ({m} - present))
             ELSE {alpha * m * m} / (sum_present + ({m} - present)) END,
             6) AS est
FROM per
"""


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    mults: tuple = (31, 131, 1009, 10007),
) -> DataFrame:
    """Count-min register table ``(lane, slot, c)`` — ``depth`` hash lanes
    × ``width`` slots, each cell the count of rows whose value hashes
    there.  Pure integer groupBy sums: mergeable across any partitioning
    of the input (union + re-sum), the property that makes CMS the
    standard streaming frequency summary.  Lane j's slot is the two-stage
    fold (mults[j] → 131)."""
    if depth > len(mults):
        raise ValueError(f"need {depth} hash multipliers, have {len(mults)}")
    s = F.col(value_col).cast("string")
    lanes = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("lane"),
                        (_stage2(s, mults[j], 131) % width).alias("slot"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("e")
    )
    return lanes.groupBy(
        F.col("e.lane").alias("lane"), F.col("e.slot").alias("slot")
    ).agg(F.count(F.lit(1)).alias("c"))


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 512,
    mults: tuple = (31, 131, 1009, 10007),
) -> DataFrame:
    """(value, est) for every distinct value whose count-min estimate
    (min over lanes of its register cells) reaches ``threshold``.

    The estimate never undercounts (one-sided error: collisions only
    inflate), so this candidate set is a SUPERSET of the true heavy
    hitters — the standard sketch contract; `est - true <= e/width * N`
    per lane with high probability.  Candidate enumeration joins the
    distinct values against the broadcast-sized register table; the
    sketch itself never needed the distinct scan and is the artifact you
    persist and merge at scale."""
    reg = cms_build(df, value_col, depth=depth, width=width, mults=mults)
    s = F.col(value_col).cast("string")
    cand = df.select(s.alias("value")).distinct()
    cand = cand.select(
        "value",
        *[
            (_stage2(F.col("value"), mults[j], 131) % width).alias(f"_s{j}")
            for j in range(depth)
        ],
    )
    est = cand
    for j in range(depth):
        rj = reg.filter(F.col("lane") == j).select(
            F.col("slot").alias(f"_s{j}"), F.col("c").alias(f"_c{j}")
        )
        est = est.join(F.broadcast(rj), f"_s{j}")
    return est.select(
        "value",
        F.least(*[F.col(f"_c{j}") for j in range(depth)]).alias("est"),
    ).filter(F.col("est") >= threshold)


def cms_error_bound(depth: int, width: int, n: int) -> float:
    """Classic CMS guarantee: est - true <= e/width * n with prob
    >= 1 - e^-depth (Cormode & Muthukrishnan 2005)."""
    return math.e / width * n


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 4096,
    depth: int = 4,
    mults: tuple = (31, 131, 1009, 10007),
) -> DataFrame:
    """Bloom filter as a DataFrame: the DISTINCT set of hit bit slots
    (one column, <= m_bits rows) over ``depth`` two-stage hash lanes.

    Set-union mergeable by construction (union + distinct), and the
    standard broadcast pre-filter at 100 TB: ship the slot set to every
    executor and drop rows whose membership probe misses BEFORE the
    expensive join/shuffle they were headed into.  No false negatives;
    false-positive rate ~ (1 - e^(-depth*n/m))^depth."""
    if depth > len(mults):
        raise ValueError(f"need {depth} hash multipliers, have {len(mults)}")
    s = F.col(value_col).cast("string")
    slots = df.select(
        F.explode(
            F.array(
                *[
                    (_stage2(s, mults[j], 131) * depth + j) % m_bits
                    for j in range(depth)
                ]
            )
        ).alias("slot")
    )
    return slots.distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    value_col: str,
    m_bits: int = 4096,
    depth: int = 4,
    mults: tuple = (31, 131, 1009, 10007),
) -> DataFrame:
    """(value, in_bloom) for each distinct probe value: ``in_bloom`` is
    true iff ALL ``depth`` slots are set (the no-false-negative test).
    ``bloom`` must come from :func:`bloom_build` with identical
    parameters; it is broadcast — the point of the structure."""
    s = F.col(value_col).cast("string")
    cand = probes.select(s.alias("value")).distinct()
    lanes = cand.select(
        "value",
        F.explode(
            F.array(
                *[
                    (_stage2(F.col("value"), mults[j], 131) * depth + j)
                    % m_bits
                    for j in range(depth)
                ]
            )
        ).alias("slot"),
    )
    hits = (
        lanes.join(F.broadcast(bloom), "slot")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return cand.join(hits, "value", "left").select(
        "value", (F.coalesce("_hits", F.lit(0)) == depth).alias("in_bloom")
    )


_KMV_M = 2**31  # padded lane shifted to [1, 2^31): est uses (k-1)·M/h_k


def _stage2_padded(col, mult1: int = 1000003, mult2: int = 1009):
    """Order-uniform portable hash: char-fold, then re-fold the decimal
    digits LPADDED to fixed width 10.

    The bucket-uniform ``_stage2`` is NOT magnitude-uniform — short
    inputs produce short stage-1 decimals, and the varying fold length
    stratifies the output ORDER so badly that two overlapping value
    sets' k-minimum sketches can share zero hashes (observed).  Fixing
    the second fold's length (lpad 10) removes the stratification:
    rank-order balance ~k/2 per population and KMV estimates land
    within their 1/√(k−1) envelope (empirically 2.7% at k=128 on 2k
    sequential keys)."""
    return poly_hash(
        F.lpad(poly_hash(col, mult1).cast("string"), 10, "0"), mult2
    )


def _stage2_padded_sql(col: str, mult1: int = 1000003,
                       mult2: int = 1009) -> str:
    return _poly_sql(
        f"lpad(CAST(({_poly_sql(col, mult1)}) AS VARCHAR), 10, '0')", mult2
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV (k-minimum-values) distinct sketch: ``(*group_cols,
    sketch: array<bigint>, present, est_distinct)`` — Bar-Yossef et al.
    2002.  Unlike HLL, the KMV register set supports SET OPERATIONS:
    two groups' sketches estimate their Jaccard and union sizes
    (:func:`kmv_jaccard_pairs`), which is what join-size estimation and
    source-overlap audits need.

    The sketch is the k smallest two-stage hash values of the group's
    distinct values; the estimator is exact below k (``present`` values
    seen) and ``(k-1)·M/h_k`` at k.  Build shape: one distinct + a
    per-group top-k that Spark plans as WindowGroupLimit (hubs cut
    map-side); the sketch row is k int64s per group regardless of input
    size — mergeable downstream with ``array_union`` + re-truncation."""
    if k < 2:
        raise ValueError("k must be >= 2")
    h = (_stage2_padded(F.col(value_col).cast("string")) + 1).alias("_h")
    d = df.select(*group_cols, h).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = d.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    g = topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_h")).alias("sketch"),
        F.count(F.lit(1)).cast("bigint").alias("present"),
    )
    hk = F.element_at("sketch", k).cast("double")
    est = F.when(F.col("present") < k, F.col("present").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(_KMV_M)) / hk
    )
    return g.withColumn("est_distinct", F.round(est, 6))


def kmv_jaccard_pairs(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise Jaccard estimates between every two groups' KMV
    sketches: ``(g_a, g_b, jaccard_est)`` with g_a < g_b.

    For each pair, the k smallest values of the UNION of both sketches
    are themselves the union's KMV sketch; the fraction of them present
    in BOTH inputs estimates the Jaccard (Beyer et al. 2007).  Pure
    array expressions over ≤k-element arrays — the pair join touches
    sketch rows (one per group), never the data."""
    a = sketches.select(
        F.col(group_col).alias("g_a"), F.col("sketch").alias("_sa")
    )
    b = sketches.select(
        F.col(group_col).alias("g_b"), F.col("sketch").alias("_sb")
    )
    j = a.join(b, F.col("g_a") < F.col("g_b"))
    merged = F.slice(
        F.sort_array(F.array_union(F.col("_sa"), F.col("_sb"))), 1, k
    )
    inter = F.size(
        F.filter(
            merged,
            lambda x: F.array_contains(F.col("_sa"), x)
            & F.array_contains(F.col("_sb"), x),
        )
    )
    est = inter.cast("double") / F.size(merged).cast("double")
    return j.select("g_a", "g_b", F.round(est, 6).alias("jaccard_est"))


def cms_heavy_change(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 512,
    mults: tuple = (31, 131, 1009, 10007),
) -> DataFrame:
    """Heavy-CHANGE detection between two epochs (the deltoids problem,
    Cormode & Muthukrishnan 2004: "what changed", not "what is big"):
    build one count-min register table per epoch, estimate every
    candidate key in both, report keys with |est_b − est_a| ≥
    ``threshold``.

    Both register tables are the mergeable epoch artifacts you would
    persist anyway; the comparison touches candidates × two
    broadcast-sized register tables.  One-sided error per epoch means
    the delta can err in either direction by at most the sum of the two
    collision inflations — the standard sketch contract, and every
    register (hence every estimate and the reported set) is
    deterministic and oracle-mirrorable.

    Output: (value, est_a, est_b, delta)."""
    reg_a = cms_build(df_a, value_col, depth=depth, width=width, mults=mults)
    reg_b = cms_build(df_b, value_col, depth=depth, width=width, mults=mults)
    s = F.col(value_col).cast("string")
    cand = (
        df_a.select(s.alias("value"))
        .unionByName(df_b.select(s.alias("value")))
        .distinct()
    )
    cand = cand.select(
        "value",
        *[
            (_stage2(F.col("value"), mults[j], 131) % width).alias(f"_s{j}")
            for j in range(depth)
        ],
    )
    est = cand
    for tag, reg in (("a", reg_a), ("b", reg_b)):
        for j in range(depth):
            rj = reg.filter(F.col("lane") == j).select(
                F.col("slot").alias(f"_s{j}"),
                F.col("c").alias(f"_{tag}{j}"),
            )
            est = est.join(F.broadcast(rj), f"_s{j}", "left")
    ea = F.least(*[F.coalesce(F.col(f"_a{j}"), F.lit(0))
                   for j in range(depth)]).cast("bigint")
    eb = F.least(*[F.coalesce(F.col(f"_b{j}"), F.lit(0))
                   for j in range(depth)]).cast("bigint")
    out = est.select(
        "value",
        ea.alias("est_a"),
        eb.alias("est_b"),
        (eb - ea).alias("delta"),
    )
    return out.filter(F.abs(F.col("delta")) >= threshold)
