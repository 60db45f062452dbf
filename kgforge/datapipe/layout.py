"""Z-order (Morton) data layout: multi-dimensional clustering for scans.

At 100 TB the scan cost of a selective two-dimensional predicate is set by
LAYOUT, not compute: range-partitioning on one column leaves the other
scattered across every file, so min/max skip stats prune nothing for it.
Interleaving the bits of both dimensions into one Morton key and
clustering on that key gives every file a small rectangle in (x, y) space
— both predicates prune (the OPTIMIZE ZORDER strategy of the public Delta
and Iceberg table formats; Morton 1966).

Everything here is integer shift/mask arithmetic on int64 (the classic
bit-spreading identities), so the whole path is whole-stage codegen and
reproducible bit-for-bit in any engine — no sampling, no floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16  # per-dimension resolution; z fits comfortably in int64


def _scale(col: Column, lo: float, hi: float) -> Column:
    """Clamp into [lo, hi] and scale to an integer bucket 0..2^16-1.
    Fixed bounds (not data min/max) keep the key mergeable across
    snapshots — yesterday's files stay correctly ordered tomorrow."""
    if not hi > lo:
        raise ValueError("zorder scale requires hi > lo")
    frac = (
        F.least(F.greatest(col.cast("double"), F.lit(float(lo))),
                F.lit(float(hi)))
        - F.lit(float(lo))
    ) / F.lit(float(hi) - float(lo))
    return F.least(
        F.floor(frac * (1 << _BITS)).cast("long"), F.lit((1 << _BITS) - 1)
    )


def _spread(x: Column) -> Column:
    """Insert a zero bit between every bit of a 16-bit value
    (0b1111 -> 0b1010101): the standard mask ladder."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_value(
    x: Column, y: Column,
    x_bounds: tuple, y_bounds: tuple,
) -> Column:
    """Morton key interleaving two scaled dimensions (x gets the even
    bits, y the odd bits) — a 32-bit int64 expression, pure codegen."""
    sx = _spread(_scale(x, *x_bounds))
    sy = _spread(_scale(y, *y_bounds))
    return sx.bitwiseOR(F.shiftleft(sy, 1))


def zorder_layout(
    df: DataFrame,
    x_col: str, y_col: str,
    x_bounds: tuple, y_bounds: tuple,
    n_buckets: int = 64,
    bucket_col: str = "_zbucket",
) -> DataFrame:
    """Attach the Morton bucket (deterministic fixed-width cut of the
    z key — NOT sampled range boundaries, so the assignment is a pure
    function of the row) and cluster the data on it.  Writing the result
    partitioned by ``bucket_col`` gives every file a bounded rectangle
    in (x, y); pair with :func:`zorder_skip_stats` for the pruning
    index."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    z = zorder_value(
        F.col(x_col), F.col(y_col), x_bounds, y_bounds
    )
    width = max((1 << (2 * _BITS)) // n_buckets, 1)
    out = df.withColumn(
        bucket_col,
        F.least(z / F.lit(width), F.lit(n_buckets - 1))
        .cast("long"),
    )
    return out.repartitionByRange(n_buckets, bucket_col)


def zorder_skip_stats(
    df: DataFrame, bucket_col: str, stat_cols: list[str]
) -> DataFrame:
    """Per-bucket (n, min, max per column) — the file-skipping index a
    scan planner consults; tight per-bucket ranges on BOTH dimensions
    are the measurable payoff of z-ordering vs single-column sort."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy(bucket_col).agg(*aggs)


def compaction_plan(
    df: DataFrame,
    part_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE bin-packing step of the
    public Delta/Iceberg maintenance commands, re-derived): group each
    partition's undersized files into rewrite bins of ~``target_bytes``.

    At 100 TB the small-files problem is a metadata and task-scheduling
    killer — a streaming sink or over-partitioned write leaves millions of
    KB-sized files, each costing a scan task and a catalog entry.  The
    planner is pure metadata work (one row per FILE, never touching data),
    so it must itself be a bounded DataFrame job:

    - files already ≥ ``target_bytes`` are left alone (``rewrite = false``,
      ``bin_id = -1``) — rewriting them would burn IO for nothing;
    - the rest are ordered size-DESC (file-id ASC tiebreak) within their
      partition and packed by the cumulative-fill rule
      ``bin_id = floor(exclusive_running_sum / target)`` — deterministic,
      one window over the partition key (bounded rows per partition — a
      partition holds at most catalog-capped file counts, never corpus
      rows), no driver loop, no sampling.  Descending order packs the big
      files first so bins overshoot by at most one small file.

    Output: one row per file — (partition, file_id, size_bytes, rewrite,
    bin_id) with bin ids dense per partition.
    """
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    from pyspark.sql import Window

    small = F.col(size_col) < F.lit(int(target_bytes))
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(size_col).desc(), F.col(file_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive running sum = inclusive - own size; small files only (the
    # keep-as-is files must not occupy fill space in anyone's bin)
    fill = F.sum(F.when(small, F.col(size_col)).otherwise(F.lit(0))).over(w) \
        - F.when(small, F.col(size_col)).otherwise(F.lit(0))
    return df.select(
        F.col(part_col),
        F.col(file_col),
        F.col(size_col),
        small.alias("rewrite"),
        F.when(small, (fill / F.lit(int(target_bytes))).cast("long"))
        .otherwise(F.lit(-1)).alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# Hilbert-curve layout keys (round-4): better locality than Morton — the
# Hilbert walk never jumps across the square, so every key range maps to a
# few compact (x, y) rectangles; Morton's Z-jumps fragment a range's
# bounding boxes far more (the reason table formats added HILBERT
# clustering alongside ZORDER).  Bit-stepped reflect-rotate-swap walk,
# Hilbert 1891 / the classic xy2d recurrence.
# ---------------------------------------------------------------------------

def _hilbert_step(div: str, pk_d: int, pk_x: int) -> str:
    """One fold step over a bit plane ``s``: unpack (d, x, y) from the
    BIGINT accumulator, extract the plane bits, advance d by s²·((3rx)^ry)
    (arithmetic form 3rx + ry − 2·rx·ry — no engine xor), reduce x, y to
    their low bits, reflect when (ry=0, rx=1), swap when ry=0, repack.
    ``div`` is the dialect's integer-division operator ('div' or '//');
    all operands are non-negative so %-semantics agree across engines."""
    d = f"(acc {div} {pk_d})"
    x = f"((acc {div} {pk_x}) % {pk_x})"
    y = f"(acc % {pk_x})"
    rx = f"(({x} {div} s) % 2)"
    ry = f"(({y} {div} s) % 2)"
    xl = f"({x} % s)"
    yl = f"({y} % s)"
    return (
        f"({d} + s * s * (3 * {rx} + {ry} - 2 * {rx} * {ry})) * {pk_d}"
        f" + (CASE WHEN {ry} = 0 THEN"
        f"      (CASE WHEN {rx} = 1 THEN s - 1 - {yl} ELSE {yl} END)"
        f"    ELSE {xl} END) * {pk_x}"
        f" + (CASE WHEN {ry} = 0 THEN"
        f"      (CASE WHEN {rx} = 1 THEN s - 1 - {xl} ELSE {xl} END)"
        f"    ELSE {yl} END)"
    )


def hilbert_key_expr(x: str, y: str, bits: int = 10,
                     dialect: str = "spark") -> str:
    """Dialect-matched SQL expression for the Hilbert d-index of integer
    columns ``x``, ``y`` in [0, 2^bits) — Spark ``aggregate`` or DuckDB
    ``list_reduce`` over the descending bit planes, state packed in one
    BIGINT, bit-identical across engines (oracle-checked).

    Slot sizes scale with ``bits`` (x slot 2^bits, d slot 4^bits, packed
    state < 2^(4·bits)), so the fold is overflow-free up to bits = 15 —
    a fixed 2^40 d-slot overflowed int64 at bits = 12, caught by a
    50M-row spot-check under ANSI mode."""
    if not 1 <= bits <= 15:
        raise ValueError("bits must be in [1, 15]")
    pk_x = 1 << bits
    pk_d = 1 << (2 * bits)
    planes = ", ".join(
        f"CAST({1 << i} AS BIGINT)" for i in range(bits - 1, -1, -1)
    )
    init = f"CAST({x} AS BIGINT) * {pk_x} + CAST({y} AS BIGINT)"
    if dialect == "spark":
        step = _hilbert_step("div", pk_d, pk_x)
        return (
            f"aggregate(array({planes}), {init},"
            f" (acc, s) -> {step}, acc -> acc div {pk_d})"
        )
    if dialect == "duckdb":
        step = _hilbert_step("//", pk_d, pk_x)
        return (
            f"list_reduce(list_prepend({init}, [{planes}]),"
            f" (acc, s) -> {step}) // {pk_d}"
        )
    raise ValueError("dialect must be 'spark' or 'duckdb'")


def hilbert_layout(df: DataFrame, x: str, y: str,
                   x_bounds: tuple, y_bounds: tuple,
                   bits: int = 10) -> DataFrame:
    """(input columns…, hx, hy, hkey) — bucketize both dimensions to
    [0, 2^bits) with fixed bounds (same mergeable-across-snapshots
    contract as :func:`zorder_value`), then the Hilbert d-index.
    Sorting / range-partitioning on ``hkey`` is the write-side
    clustering; pair with zorder_skip_stats-style min/max pruning on the
    read side."""
    # reuse the shared 16-bit _scale, then shift down to the requested
    # resolution — integer-exact (both are floor operations on powers of 2)
    d = df.withColumn(
        "hx", F.shiftright(_scale(F.col(x), *x_bounds), _BITS - bits)
        .cast("long"),
    ).withColumn(
        "hy", F.shiftright(_scale(F.col(y), *y_bounds), _BITS - bits)
        .cast("long"),
    )
    return d.withColumn(
        "hkey", F.expr(hilbert_key_expr("hx", "hy", bits)).cast("long")
    )
