import pytest

from kgforge.anonymize.mondrian import mondrian_anonymize


def _mirror(rows, qi_idx, k, rounds=24):
    """Python mirror of the rank-split round-robin recursion."""
    pid = {r[0]: 0 for r in rows}
    by_id = {r[0]: r for r in rows}
    d = len(qi_idx)
    for r in range(rounds):
        groups = {}
        for i, p in pid.items():
            groups.setdefault(p, []).append(i)
        if max(len(g) for g in groups.values()) < 2 * k:
            break
        ai = qi_idx[r % d]
        new = {}
        for p, ids in groups.items():
            order = sorted(ids, key=lambda i: (by_id[i][ai], i))
            n = len(order)
            for rn, i in enumerate(order, start=1):
                side = 1 if (n >= 2 * k and rn > n // 2) else 0
                new[i] = p * 2 + side
        pid = new
    groups = {}
    for i, p in pid.items():
        groups.setdefault(p, []).append(i)
    out = {}
    for ids in groups.values():
        g = min(ids)
        for i in ids:
            out[i] = (g, len(ids))
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "id int, a int, b int")
    got = mondrian_anonymize(df, ["a", "b"], k, "id").collect()
    return {
        r["id"]: (
            r["group"], r["group_n"],
            r["a_lo"], r["a_hi"], r["b_lo"], r["b_hi"],
        )
        for r in got
    }


def test_matches_python_mirror(spark):
    rows = [(i, (i * 7) % 23, (i * 11) % 19) for i in range(40)]
    got = _run(spark, rows, 5)
    want = _mirror(rows, [1, 2], 5)
    assert {i: v[:2] for i, v in got.items()} == want


def test_k_guarantee_and_bounds(spark):
    rows = [(i, i % 13, (i * 3) % 7) for i in range(60)]
    got = _run(spark, rows, 4)
    by_group = {}
    for i, (g, n, alo, ahi, blo, bhi) in got.items():
        by_group.setdefault(g, []).append((i, n, alo, ahi, blo, bhi))
    for g, members in by_group.items():
        n = members[0][1]
        assert n == len(members) and n >= 4
        avals = [rows[i][1] for i, *_ in members]
        bvals = [rows[i][2] for i, *_ in members]
        assert members[0][2] == min(avals) and members[0][3] == max(avals)
        assert members[0][4] == min(bvals) and members[0][5] == max(bvals)


def test_small_input_single_group(spark):
    rows = [(1, 5, 5), (2, 6, 6), (3, 7, 7)]
    got = _run(spark, rows, 4)
    assert {v[:2] for v in got.values()} == {(1, 3)}


def test_exact_power_of_two_split(spark):
    rows = [(i, i, 0) for i in range(8)]
    got = _run(spark, rows, 2)
    sizes = {v[1] for v in got.values()}
    assert sizes == {2}
    # groups are contiguous runs of the sorted attribute
    groups = {}
    for i, v in got.items():
        groups.setdefault(v[0], []).append(i)
    assert sorted(sorted(g) for g in groups.values()) == [
        [0, 1], [2, 3], [4, 5], [6, 7],
    ]


def test_bad_args(spark):
    df = spark.createDataFrame([(1, 1, 1)], "id int, a int, b int")
    with pytest.raises(ValueError):
        mondrian_anonymize(df, [], 2, "id")
    with pytest.raises(ValueError):
        mondrian_anonymize(df, ["a"], 0, "id")
