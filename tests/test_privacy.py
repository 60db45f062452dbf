"""l-diversity / t-closeness KPIs vs hand-computed values."""

from __future__ import annotations

import math

import pytest

from kgforge.anonymize.privacy import (
    l_diversity,
    l_diversity_by_group,
    t_closeness,
    t_closeness_by_group,
)

# two quasi-groups over sensitive {x, y, z}:
#   g1: x,x,y,y  (2 distinct; p = .5/.5)
#   g2: x,x,x,z  (2 distinct; p = .75/.25)
# global: x=5/8, y=2/8, z=1/8
ROWS = [
    ("g1", "x"), ("g1", "x"), ("g1", "y"), ("g1", "y"),
    ("g2", "x"), ("g2", "x"), ("g2", "x"), ("g2", "z"),
]


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(ROWS, "grp string, sens string")


def test_l_diversity_groups(spark, table):
    got = {r["grp"]: r for r in
           l_diversity_by_group(table, ["grp"], "sens").collect()}
    assert got["g1"]["l_distinct"] == 2 and got["g2"]["l_distinct"] == 2
    assert got["g1"]["group_size"] == 4 and got["g2"]["group_size"] == 4
    assert got["g1"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    h2 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert got["g2"]["entropy"] == pytest.approx(h2, abs=1e-6)
    assert l_diversity(table, ["grp"], "sens") == 2


def test_t_closeness_groups(spark, table):
    got = {r["grp"]: r["tvd"] for r in
           t_closeness_by_group(table, ["grp"], "sens").collect()}
    # g1: |.5-.625| + |.5-.25| + (1 - (.625+.25)) = .125+.25+.125 → tvd .25
    assert got["g1"] == pytest.approx(0.25, abs=1e-6)
    # g2: |.75-.625| + |.25-.125| + (1 - (.625+.125)) = .125+.125+.25 → .25
    assert got["g2"] == pytest.approx(0.25, abs=1e-6)
    assert t_closeness(table, ["grp"], "sens") == pytest.approx(0.25, abs=1e-6)


def test_uniform_table_is_ideal(spark):
    # every group mirrors the global distribution → tvd 0, full diversity
    rows = [(g, s) for g in ("a", "b") for s in ("x", "y", "z")]
    df = spark.createDataFrame(rows, "grp string, sens string")
    assert l_diversity(df, ["grp"], "sens") == 3
    assert t_closeness(df, ["grp"], "sens") == pytest.approx(0.0, abs=1e-9)


def test_suppress_small_groups_masks_rare_and_null_qi(spark):
    from kgforge.anonymize.privacy import suppress_small_groups

    rows = [
        ("a", "m", 1), ("a", "m", 2), ("a", "m", 3),   # group of 3 → kept
        ("b", "f", 4),                                  # singleton → masked
        (None, "f", 5),                                 # NULL QI singleton → masked
        (None, None, 6), (None, None, 7),               # NULL-NULL pair
    ]
    df = spark.createDataFrame(rows, "city string, sex string, id int")
    got = {r["id"]: r for r in
           suppress_small_groups(df, ["city", "sex"], k=3).collect()}
    assert len(got) == 7  # no row lost to the join
    for i in (1, 2, 3):
        assert not got[i]["suppressed"] and got[i]["city"] == "a"
    for i in (4, 5, 6, 7):
        assert got[i]["suppressed"], f"row {i} escaped suppression"
        assert got[i]["city"] == "*****" and got[i]["sex"] == "*****"


def test_dp_group_counts_mirror_and_scale(spark):
    import math

    from kgforge.anonymize.privacy import dp_group_counts

    rows = [(i, f"g{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, grp string")
    eps = 0.5
    got = {
        r["grp"]: (r["n"], r["released"])
        for r in dp_group_counts(df, ["grp"], epsilon=eps, seed="s1").collect()
    }
    P = 2147483647
    for g in (f"g{i}" for i in range(5)):
        acc = 0
        for ch in f"{g}:s1":
            acc = (acc * 31 + ord(ch)) % P
        u = (acc + 1) / float(P + 1)
        v = u - 0.5
        noise = -(1.0 / eps) * math.copysign(1.0, v) * math.log(1.0 - 2.0 * abs(v))
        n, released = got[g]
        assert n == 40
        assert released == round(40 + noise, 6)
    # different seed → different noise
    got2 = {
        r["grp"]: r["released"]
        for r in dp_group_counts(df, ["grp"], epsilon=eps, seed="s2").collect()
    }
    assert any(got2[g] != got[g][1] for g in got2)


def test_dp_noise_magnitude_tracks_epsilon(spark):
    from kgforge.anonymize.privacy import dp_group_counts

    rows = [(i, f"g{i % 50}") for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, grp string")

    def mean_abs(eps):
        out = dp_group_counts(df, ["grp"], epsilon=eps).collect()
        return sum(abs(r["released"] - r["n"]) for r in out) / len(out)

    assert mean_abs(0.1) > mean_abs(10.0) * 10
