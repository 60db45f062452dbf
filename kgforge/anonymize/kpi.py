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
    return [
        (type_iri, KPIS_PRED, kpi_obj, "iri", True),
        (kpi_obj, K_ANONYMITY, str(k), "xsd:integer", False),
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
) -> int:
    """Compute the k-anonymity KPI for one object type (KpiService.java:75-99).

    Runs BEFORE original-value deletion, exactly like the reference (KPI at
    AnonymizationService.java:101-104, delete at :105-108).
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

    a = ent.select(F.col("subj").alias("_sa"), *[F.col(c).alias(c + "_a") for c in gcols])
    b = ent.select(F.col("subj").alias("_sb"), *[F.col(c).alias(c + "_b") for c in gcols])
    cond = F.lit(True)
    for c in gcols:
        cond = cond & F.col(c + "_a").eqNullSafe(F.col(c + "_b"))
    pairs = a.join(b, cond)

    for j, attr in enumerate(rand_attrs):
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
