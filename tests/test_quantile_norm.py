from kgforge.datapipe.stats import quantile_normalize


def _mirror(rows, N=None):
    pooled = sorted((v, i) for i, _, v in rows)
    vals = [v for v, _ in pooled]
    N = len(rows)
    by_g = {}
    for i, g, v in rows:
        by_g.setdefault(g, []).append((v, i))
    out = {}
    for g, members in by_g.items():
        members.sort()
        ng = len(members)
        for r, (v, i) in enumerate(members, start=1):
            pos = (r * N + ng - 1) // ng
            out[i] = vals[pos - 1]
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id int, g string, v int")
    got = quantile_normalize(df, "g", "v", "id").collect()
    return {r["id"]: r["normalized"] for r in got}


def test_matches_mirror_unequal_groups(spark):
    rows = [(1, "a", 5), (2, "a", 50), (3, "a", 500),
            (4, "b", 7), (5, "b", 8), (6, "b", 9), (7, "b", 10), (8, "b", 11),
            (9, "c", 1000)]
    assert _run(spark, rows) == _mirror(rows)


def test_groups_get_identical_marginals_when_equal_sized(spark):
    rows = [(1, "a", 100), (2, "a", 300), (3, "a", 200),
            (4, "b", 1), (5, "b", 3), (6, "b", 2)]
    got = _run(spark, rows)
    a_vals = sorted(got[i] for i in (1, 2, 3))
    b_vals = sorted(got[i] for i in (4, 5, 6))
    assert a_vals == b_vals  # the whole point of quantile normalization


def test_max_rank_maps_to_pooled_max(spark):
    rows = [(1, "a", 10), (2, "b", 99)]
    got = _run(spark, rows)
    assert got[2] == 99 and got[1] in (10, 99)
