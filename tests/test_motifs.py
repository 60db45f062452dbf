import itertools
import random

from kgforge.kg.motifs import square_count, square_pairs


def _brute_squares(pairs) -> int:
    nbrs: dict = {}
    for a, b in pairs:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    total = 0
    nodes = sorted(nbrs)
    for p, q in itertools.combinations(nodes, 2):
        lam = len(nbrs[p] & nbrs[q] - {p, q})
        total += lam * (lam - 1) // 2
    assert total % 2 == 0
    return total // 2


def _brute_pairs(pairs) -> dict:
    """id-canonical pair -> (n_low, n_common) for pairs with n_low >= 1,
    using the same (degree, id) precedence as oriented_edges."""
    nbrs: dict = {}
    for a, b in pairs:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    order = {v: (len(nbrs[v]), v) for v in nbrs}
    out = {}
    for p, q in itertools.combinations(sorted(nbrs), 2):
        common = nbrs[p] & nbrs[q] - {p, q}
        low = [x for x in common if order[x] < order[p] and order[x] < order[q]]
        if low:
            out[(min(p, q), max(p, q))] = (len(low), len(common))
    return out


def test_square_count_matches_brute(spark):
    rng = random.Random(7)
    pairs = {tuple(sorted(rng.sample(range(30), 2))) for _ in range(120)}
    df = spark.createDataFrame(sorted(pairs), "src int, dst int")
    got = square_count(df).collect()[0]["n_squares"]
    assert got == _brute_squares(pairs)
    assert got > 0  # non-vacuous


def test_square_count_with_hub(spark):
    # a hub adjacent to everything plus a sparse ring — the case the
    # naive per-center wedge join blows up on
    ring = [(i, (i + 1) % 20) for i in range(20)]
    hub = [(99, i) for i in range(20)]
    pairs = ring + hub
    df = spark.createDataFrame(pairs, "src int, dst int")
    got = square_count(df).collect()[0]["n_squares"]
    assert got == _brute_squares(pairs)


def test_square_pairs_match_brute(spark):
    rng = random.Random(11)
    pairs = {tuple(sorted(rng.sample(range(25), 2))) for _ in range(90)}
    df = spark.createDataFrame(sorted(pairs), "src int, dst int")
    got = {
        (r["a"], r["b"]): (r["n_low"], r["n_common"])
        for r in square_pairs(df).collect()
    }
    assert got == _brute_pairs(pairs)
    assert got


def test_known_small_graphs(spark):
    # one 4-cycle
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    assert square_count(df).collect()[0]["n_squares"] == 1
    # K4 has 3 four-cycles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "src int, dst int")
    assert square_count(df).collect()[0]["n_squares"] == 3
    # a triangle has none
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src int, dst int")
    assert square_count(df).collect()[0]["n_squares"] == 0


def test_partition_invariant(spark):
    rng = random.Random(3)
    pairs = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(200)})
    df = spark.createDataFrame(pairs, "src int, dst int")
    a = square_count(df.repartition(1)).collect()[0]["n_squares"]
    b = square_count(df.repartition(16)).collect()[0]["n_squares"]
    assert a == b
