import pytest

from kgforge.datapipe.stats import weighted_median


def _mirror(rows):
    by_g = {}
    for g, i, v, w in rows:
        by_g.setdefault(g, []).append((v, i, w))
    out = {}
    for g, members in by_g.items():
        members.sort()
        tot = sum(w for _, _, w in members)
        cum = 0
        for v, _, w in members:
            cum += w
            if 2 * cum >= tot:
                out[g] = v
                break
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g string, id int, v int, w int")
    got = weighted_median(df, ["g"], "v", "w", "id").collect()
    return {r["g"]: r["wmedian"] for r in got}


def test_matches_mirror(spark):
    rows = [
        ("a", 1, 10, 1), ("a", 2, 20, 1), ("a", 3, 30, 5),
        ("b", 4, 1, 3), ("b", 5, 100, 1),
    ]
    got = _run(spark, rows)
    assert got == _mirror(rows)
    assert got["a"] == 30   # heavy tail pulls the weighted median up
    assert got["b"] == 1


def test_equal_weights_reduce_to_lower_median(spark):
    rows = [("g", i, v, 1) for i, v in enumerate([5, 1, 9, 3])]
    assert _run(spark, rows) == {"g": 3}  # lower median of 1,3,5,9


def test_half_boundary_takes_lower_value(spark):
    rows = [("g", 1, 10, 1), ("g", 2, 20, 1)]
    # cum(10)=1, 2*1 >= 2 -> 10 is the lower weighted median
    assert _run(spark, rows) == {"g": 10}


def test_empty_groups_rejected(spark):
    df = spark.createDataFrame([("g", 1, 1, 1)], "g string, id int, v int, w int")
    with pytest.raises(ValueError):
        weighted_median(df, [], "v", "w", "id")
