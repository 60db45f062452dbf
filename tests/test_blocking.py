import pytest

from kgforge.datapipe.blocking import sorted_neighborhood_pairs


def _run(spark, rows, window):
    df = spark.createDataFrame(rows, "id int, key string")
    out = sorted_neighborhood_pairs(df, "id", "key", window=window)
    return {(r["id_a"], r["id_b"]) for r in out.collect()}


def _mirror(rows, window):
    order = [i for i, _ in sorted(rows, key=lambda t: (t[1], t[0]))]
    pairs = set()
    for a in range(len(order)):
        for b in range(a + 1, min(a + window, len(order))):
            pairs.add((order[a], order[b]))
    return pairs


def test_window_pairs_match_mirror(spark):
    rows = [(1, "smith"), (2, "smyth"), (3, "adams"), (4, "smithe"), (5, "adam")]
    for w in (2, 3, 4):
        assert _run(spark, rows, w) == _mirror(rows, w)


def test_ties_ordered_by_id(spark):
    rows = [(7, "x"), (3, "x"), (5, "x")]
    # sorted order: (x,3), (x,5), (x,7) -> adjacent pairs at w=2
    assert _run(spark, rows, 2) == {(3, 5), (5, 7)}


def test_window_two_is_adjacent_only(spark):
    rows = [(1, "a"), (2, "b"), (3, "c")]
    assert _run(spark, rows, 2) == {(1, 2), (2, 3)}


def test_keys_carried_through(spark):
    rows = [(1, "aa"), (2, "bb")]
    sdf = sorted_neighborhood_pairs(
        spark.createDataFrame(rows, "id int, key string"), "id", "key", 2
    ).collect()
    assert [(r["id_a"], r["key_a"], r["id_b"], r["key_b"]) for r in sdf] == [
        (1, "aa", 2, "bb")
    ]


def test_bad_window_rejected(spark):
    df = spark.createDataFrame([(1, "a")], "id int, key string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "key", window=1)
