"""k-anonymity KPIs (reference: service/KpiService.java).

k-anonymity = min over resources of |generalization-group(r) ∩
(∩ per randomized attr: {r2 : orig(r2) within rand(r) ± benchmark})| where
benchmark = 2·mean(|orig − rand|) and null originals form their own
similarity group (KpiService.java:75-154).

Implemented as a null-safe self-join on the generalization group key plus one
range predicate per randomized attribute — no driver-side sets.  At corpus
scale the pair join is bounded by the largest group; AQE skew-join plus
salting on the group key is the documented mitigation (the k-statistic itself
only needs per-resource counts, which stay distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.config import AttrConfig
from kgforge.triples import SOYA_URL, local_name, subjects_of_type

KPI_OBJECT_URI = SOYA_URL + "kpi"
K_ANONYMITY = SOYA_URL + "kanonymity"
HAS_ATTRIBUTE = SOYA_URL + "hasAttribute"
ANONYMIZATION_TYP = SOYA_URL + "anonymizationTyp"
NR_BUCKETS = SOYA_URL + "nrBucketsUsed"
KPIS_PRED = SOYA_URL + "kpis"


def attribute_info_rows(type_iri: str, attr: str, strategy: str, g: int) -> list[tuple]:
    """KpiService.addAttributeInformation:61-73 — called only for non-masking
    operators (Masking uses the constructor that never sets calculateKpi)."""
    kpi_obj = KPI_OBJECT_URI + local_name(type_iri)
    rows = [
        (kpi_obj, HAS_ATTRIBUTE, attr, "iri", True),
        (attr, ANONYMIZATION_TYP, strategy, "string", False),
    ]
    if strategy != "masking":
        rows.append((attr, NR_BUCKETS, str(g), "xsd:long", False))
    return rows


def kpi_object_rows(type_iri: str, k: int) -> list[tuple]:
    kpi_obj = KPI_OBJECT_URI + local_name(type_iri)
    # Reference quirk (KpiService.java:43-44): `anonymizationObject` is a
    # Resource of the CONFIG model, so `addProperty(soya:kpis, kpiObject)`
    # writes the (type, kpis, kpiObject) link into the discarded config
    # model, never the response model — the goldens contain only the KPI
    # node itself.  We reproduce that: no kpis link triple.
    return [
        # Jena Resource.addLiteral has no int overload, so the reference's
        # int k widens to long → typed xsd:long (KpiService.java:47)
        (kpi_obj, K_ANONYMITY, str(k), "xsd:long", False),
    ]


def _kpi_parse(datatype: str, c):
    """KPI numeric domain: doubles, or epoch *seconds* for dates
    (KpiService.java:117-130 via RandomizationDateTime.literalToNumericDate).

    try_cast, not cast: under ANSI mode Catalyst constant-folds projection
    expressions of union branches BEFORE the pred filter prunes them, so a
    strict cast would error on non-numeric literals from other predicates.
    Values reaching the KPI are validated upstream — null means absent."""
    if datatype in ("date", "dateTime"):
        ts = F.coalesce(F.to_timestamp(F.to_date(c)), F.to_timestamp(c))
        return F.unix_timestamp(ts).cast("double")
    return c.try_cast("double")


def k_anonymity(
    triples: DataFrame,
    type_iri: str,
    used_attrs: list[str],
    cfgs: dict[str, AttrConfig],
    mode: str = "auto",
    pair_threshold: int = 50_000,
) -> int:
    """Compute the k-anonymity KPI for one object type (KpiService.java:75-99).

    Runs BEFORE original-value deletion, exactly like the reference (KPI at
    AnonymizationService.java:101-104, delete at :105-108).

    ``mode`` picks the counting strategy for randomized attributes:

    - ``"pairs"`` — null-safe self-join on the generalization-group key plus
      one range predicate per attribute.  Simple and oracle-mirrored, but the
      pair set costs O(Σ group²): one huge/skewed group (e.g. an all-masked
      config ⇒ a single group) pins reducers at corpus scale.
    - ``"ranges"`` (single randomized attribute) — the reference's own
      ``TreeMap.subMap`` counting (KpiService.java:156-170) distributed:
      per-group sorted event stream of value points (+1) and query bounds
      (rand ± benchmark), a range-partitioned global running sum
      (kgforge.rank.with_global_running_sum), and per-resource counts as
      runsum(hi) − runsum(lo).  O(n log n) shuffle-sort, never materializes
      a pair, immune to group skew (the sort spreads a giant group across
      all partitions).
    - ``"grouped"`` (≥2 randomized attributes) — per-group applyInPandas:
      sort by the first attribute, numpy ``searchsorted`` window per
      resource, vectorized verification of the remaining attributes over the
      window.  Work is Σ|window| (the pairs passing attribute 1) but stays
      in-memory per group — no shuffled pair set.
    - ``"auto"`` — ``pairs`` at or below ``pair_threshold`` subjects
      (cheapest for fixture-sized inputs), else ``ranges``/``grouped``.

    All paths produce identical k (property-tested against each other).
    """
    subjects = subjects_of_type(triples, type_iri)
    ent = subjects
    gcols: list[str] = []
    for i, attr in enumerate(used_attrs):
        gp = (
            triples.filter(F.col("pred") == attr + "_generalized")
            .select("subj", F.col("obj_value").alias(f"_g{i}"))
            .dropDuplicates(["subj"])
        )
        ent = ent.join(gp, "subj", "left")
        gcols.append(f"_g{i}")

    rand_attrs = [a for a in used_attrs if cfgs[a].strategy == "randomization"]
    if not rand_attrs:
        row = ent.groupBy(*[F.col(c) for c in gcols] if gcols else [F.lit(1)]).count().agg(
            F.min("count").alias("k")
        ).collect()[0]
        if row["k"] is None:
            # reference quirk (QueryBuildingService.java:142-163 +
            # QueryService.java:215-235): with zero attributes the groups
            # query has NO GROUP BY, so the aggregate over zero rows still
            # yields one row whose empty GROUP_CONCAT splits into a single
            # empty-IRI resource — one group of size 1 ⇒ k = 1.  With
            # attributes (GROUP BY present) zero rows ⇒ no groups ⇒ k = 0.
            return 1 if not used_attrs else 0
        return int(row["k"])

    # per-attribute column vectors + the global benchmark (2·mean |o − r|,
    # computed over the whole type like the reference — never per group)
    attr_data: list[tuple] = []
    for attr in rand_attrs:
        dtp = cfgs[attr].datatype
        orig = (
            triples.filter(F.col("pred") == attr)
            .join(subjects, "subj", "left_semi")
            .select("subj", _kpi_parse(dtp, F.col("obj_value")).alias("_o"))
            .dropDuplicates(["subj"])
        )
        rand = (
            triples.filter(F.col("pred") == attr + "_randomized")
            .join(subjects, "subj", "left_semi")
            .select("subj", _kpi_parse(dtp, F.col("obj_value")).alias("_r"))
            .dropDuplicates(["subj"])
        )
        stats = (
            orig.join(rand, "subj")
            .agg(F.sum(F.abs(F.col("_o") - F.col("_r"))).alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()[0]
        )
        bench = (2.0 * stats["s"] / stats["c"]) if stats["c"] else None
        attr_data.append((attr, orig, rand, bench))

    if mode == "auto":
        mode = (
            "pairs"
            if subjects.count() <= pair_threshold
            else ("ranges" if len(rand_attrs) == 1 else "grouped")
        )
    if mode == "ranges" and len(rand_attrs) != 1:
        mode = "grouped"

    if mode == "pairs":
        return _k_pairs(subjects, ent, gcols, attr_data)
    if mode == "ranges":
        return _k_ranges(subjects, ent, gcols, attr_data[0])
    if mode == "grouped":
        return _k_grouped(subjects, ent, gcols, attr_data)
    raise ValueError(f"unknown k-anonymity mode: {mode!r}")


def _k_pairs(subjects, ent, gcols, attr_data) -> int:
    """Null-safe group-key self-join + range predicates (small-input path)."""
    a = ent.select(F.col("subj").alias("_sa"), *[F.col(c).alias(c + "_a") for c in gcols])
    b = ent.select(F.col("subj").alias("_sb"), *[F.col(c).alias(c + "_b") for c in gcols])
    cond = F.lit(True)
    for c in gcols:
        cond = cond & F.col(c + "_a").eqNullSafe(F.col(c + "_b"))
    pairs = a.join(b, cond)

    for j, (_, orig, rand, bench) in enumerate(attr_data):
        oa = orig.select(F.col("subj").alias("_sa"), F.col("_o").alias(f"_oa{j}"))
        ob = orig.select(F.col("subj").alias("_sb"), F.col("_o").alias(f"_ob{j}"))
        ra = rand.select(F.col("subj").alias("_sa"), F.col("_r").alias(f"_ra{j}"))
        pairs = pairs.join(oa, "_sa", "left").join(ob, "_sb", "left").join(ra, "_sa", "left")
        null_pair = F.col(f"_oa{j}").isNull() & F.col(f"_ob{j}").isNull()
        if bench is None:
            pairs = pairs.filter(null_pair)
        else:
            in_range = (
                F.col(f"_oa{j}").isNotNull()
                & F.col(f"_ob{j}").isNotNull()
                & (F.abs(F.col(f"_ob{j}") - F.col(f"_ra{j}")) <= F.lit(bench))
            )
            pairs = pairs.filter(null_pair | in_range)

    cnts = pairs.groupBy("_sa").count()
    row = (
        subjects.join(cnts, subjects["subj"] == cnts["_sa"], "left")
        .select(F.min(F.coalesce(F.col("count"), F.lit(0))).alias("k"))
        .collect()[0]
    )
    return int(row["k"]) if row["k"] is not None else 0


def _with_group_struct(ent, gcols):
    """Single struct group key — struct equality treats null fields as equal,
    which makes joins/groupBys on it null-safe (matches eqNullSafe)."""
    key = F.struct(*[F.col(c) for c in gcols]) if gcols else F.struct(F.lit(1))
    return ent.withColumn("_gs", key)


def _k_ranges(subjects, ent, gcols, attr_datum) -> int:
    """Distributed subMap counting for ONE randomized attribute.

    Event stream per group: points (orig value, +1) and per-resource query
    bounds rand±benchmark (weight 0).  Sorted by (group, value, typ) with
    typ lo(0) < point(1) < hi(2) so both bounds are inclusive; the inclusive
    global running sum of weights then gives
    count(r) = runsum(hi_r) − runsum(lo_r) — points of other groups cancel
    because the group struct leads the sort order.  No pair is ever
    materialized and a single giant group spreads across all partitions.
    """
    from kgforge.rank import with_global_running_sum

    _, orig, rand, bench = attr_datum
    base = _with_group_struct(
        ent.join(orig, "subj", "left").join(rand, "subj", "left"), gcols
    ).persist()

    nullrows = base.filter(F.col("_o").isNull()).select("subj", "_gs")
    ncnt = nullrows.groupBy("_gs").agg(F.count(F.lit(1)).alias("_cnt"))
    cnt_null = nullrows.join(ncnt, "_gs").select("subj", "_cnt")

    nonnull = base.filter(F.col("_o").isNotNull())
    if bench is None:
        cnt_nonnull = nonnull.select("subj", F.lit(0).cast("long").alias("_cnt"))
    else:
        pts = nonnull.select(
            "_gs", F.col("_o").alias("_val"), F.lit(1).alias("_typ"),
            F.lit(1).cast("long").alias("_delta"),
            F.lit(None).cast("string").alias("_q"),
        )
        qlo = nonnull.select(
            "_gs", (F.col("_r") - F.lit(bench)).alias("_val"), F.lit(0).alias("_typ"),
            F.lit(0).cast("long").alias("_delta"), F.col("subj").alias("_q"),
        )
        qhi = nonnull.select(
            "_gs", (F.col("_r") + F.lit(bench)).alias("_val"), F.lit(2).alias("_typ"),
            F.lit(0).cast("long").alias("_delta"), F.col("subj").alias("_q"),
        )
        ev = pts.unionByName(qlo).unionByName(qhi)
        rs = with_global_running_sum(
            ev, [F.col("_gs"), F.col("_val"), F.col("_typ")], "_delta", out="_rs"
        )
        cnt_nonnull = (
            rs.filter(F.col("_q").isNotNull())
            .groupBy("_q")
            .agg(
                (
                    F.max(F.when(F.col("_typ") == 2, F.col("_rs")))
                    - F.max(F.when(F.col("_typ") == 0, F.col("_rs")))
                ).alias("_cnt")
            )
            .select(F.col("_q").alias("subj"), "_cnt")
        )

    cnts = cnt_nonnull.unionByName(cnt_null)
    row = (
        subjects.join(cnts, "subj", "left")
        .select(F.min(F.coalesce(F.col("_cnt"), F.lit(0))).alias("k"))
        .collect()[0]
    )
    base.unpersist()
    return int(row["k"]) if row["k"] is not None else 0


def _k_grouped(subjects, ent, gcols, attr_data) -> int:
    """Per-group vectorized counting for ≥2 randomized attributes: sort the
    group by attribute 0, searchsorted window per resource, numpy-verify the
    remaining attributes over the window (no shuffled pair set)."""
    import numpy as np
    import pandas as pd

    full = ent
    for j, (_, orig, rand, _) in enumerate(attr_data):
        full = (
            full.join(orig.select("subj", F.col("_o").alias(f"_o{j}")), "subj", "left")
            .join(rand.select("subj", F.col("_r").alias(f"_r{j}")), "subj", "left")
        )
    full = _with_group_struct(full, gcols)
    benches = [b for (_, _, _, b) in attr_data]
    nattrs = len(attr_data)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        O = [pdf[f"_o{j}"].to_numpy(dtype=float) for j in range(nattrs)]
        R = [pdf[f"_r{j}"].to_numpy(dtype=float) for j in range(nattrs)]
        isnull = [np.isnan(O[j]) for j in range(nattrs)]
        nn0 = np.flatnonzero(~isnull[0])
        nn0 = nn0[np.argsort(O[0][nn0], kind="stable")]
        sorted_o0 = O[0][nn0]
        null0 = np.flatnonzero(isnull[0])
        b0 = benches[0]
        counts = np.zeros(n, dtype=np.int64)
        for i in range(n):
            if isnull[0][i]:
                cand = null0
            elif b0 is None:
                continue
            else:
                lo = np.searchsorted(sorted_o0, R[0][i] - b0, side="left")
                hi = np.searchsorted(sorted_o0, R[0][i] + b0, side="right")
                cand = nn0[lo:hi]
            ok = np.ones(cand.size, dtype=bool)
            for j in range(1, nattrs):
                bj = benches[j]
                if isnull[j][i]:
                    ok &= isnull[j][cand]
                elif bj is None:
                    ok[:] = False
                    break
                else:
                    oc = O[j][cand]
                    ok &= (
                        ~isnull[j][cand]
                        & (oc >= R[j][i] - bj)
                        & (oc <= R[j][i] + bj)
                    )
            counts[i] = int(ok.sum())
        return pd.DataFrame({"subj": pdf["subj"], "_cnt": counts})

    cnts = full.groupBy("_gs").applyInPandas(fn, "subj string, _cnt long")
    row = (
        subjects.join(cnts, "subj", "left")
        .select(F.min(F.coalesce(F.col("_cnt"), F.lit(0))).alias("k"))
        .collect()[0]
    )
    return int(row["k"]) if row["k"] is not None else 0
