from kgforge.datapipe.intervals import allen_join


def _run(spark, rows):
    df = spark.createDataFrame(rows, "key string, id string, lo int, hi int")
    out = allen_join(df, df, "key", "id", "lo", "hi")
    return {(r["id_a"], r["id_b"]): r["relation"] for r in out.collect()}


def test_all_relations(spark):
    rows = [
        ("k", "base", 10, 20),
        ("k", "eq", 10, 20),
        ("k", "meets", 20, 30),       # base meets it (base.hi == its.lo)
        ("k", "starts", 10, 15),      # starts base
        ("k", "during", 12, 18),
        ("k", "contains", 5, 25),
        ("k", "finishes", 15, 20),
        ("k", "overlaps", 15, 25),
        ("k", "disjoint", 100, 110),
    ]
    got = _run(spark, rows)
    assert got[("base", "eq")] == "equals"
    assert got[("base", "meets")] == "meets"
    assert got[("meets", "base")] == "met_by"
    assert got[("starts", "base")] == "starts"
    assert got[("base", "starts")] == "started_by"
    assert got[("during", "base")] == "during"
    assert got[("base", "during")] == "contains"
    assert got[("base", "contains")] == "during"
    assert got[("finishes", "base")] == "finishes"
    assert got[("base", "finishes")] == "finished_by"
    assert got[("base", "overlaps")] == "overlaps"
    assert got[("overlaps", "base")] == "overlapped_by"
    assert not any("disjoint" in p for p in got)


def test_keys_isolate(spark):
    rows = [("a", "x", 0, 10), ("b", "y", 0, 10)]
    assert _run(spark, rows) == {}


def test_no_self_pairs(spark):
    rows = [("k", "x", 0, 10)]
    assert _run(spark, rows) == {}
