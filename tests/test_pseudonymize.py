from kgforge.anonymize.privacy import pseudonymize


def test_stable_sorted_tokens(spark):
    df = spark.createDataFrame(
        [(1, "carol"), (2, "alice"), (3, "bob"), (4, "alice")],
        "id int, name string",
    )
    got = {r["id"]: r["name_pseudo"]
           for r in pseudonymize(df, "name").collect()}
    # sorted distinct: alice=0, bob=1, carol=2 — same value, same token
    assert got == {
        1: "anon_000000002",
        2: "anon_000000000",
        3: "anon_000000001",
        4: "anon_000000000",
    }


def test_nulls_stay_null_and_row_count_kept(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x")], "id int, name string"
    )
    out = pseudonymize(df, "name", out="tok", prefix="p", width=3).collect()
    got = {r["id"]: r["tok"] for r in out}
    assert len(out) == 3
    assert got[1] == "p000" and got[3] == "p000" and got[2] is None


def test_distinct_token_per_distinct_value(spark):
    vals = [(i, f"v{i % 37}") for i in range(200)]
    df = spark.createDataFrame(vals, "id int, name string")
    out = pseudonymize(df, "name").collect()
    pairs = {(r["name"], r["name_pseudo"]) for r in out}
    assert len({p for _, p in pairs}) == 37 == len(pairs)
