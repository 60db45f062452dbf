import math

import pytest

from kgforge.datapipe.retrieval import bm25_scores, mmr_select, rrf_fuse


def _bm25_mirror(docs, terms, k1=1.2, b=0.75):
    toked = {i: t.lower().strip().split(" ") for i, t in docs}
    n = len(docs)
    sumdl = sum(len(v) for v in toked.values())
    out = {}
    for i, tk in toked.items():
        dl = len(tk)
        s = 0.0
        hit = False
        for t in terms:
            tf = tk.count(t)
            if tf:
                hit = True
            df = sum(1 for v in toked.values() if t in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl * n / sumdl))
        if hit:
            out[i] = round(s, 6)
    return out


DOCS = [
    (1, "the quick brown fox"),
    (2, "the lazy dog sleeps"),
    (3, "quick quick fox runs fast"),
    (4, "nothing relevant here"),
]
RRF_ROWS = [
    ("r1", 1, 0.9), ("r1", 2, 0.8), ("r1", 3, 0.7),
    ("r2", 2, 0.95), ("r2", 3, 0.9), ("r2", 1, 0.1),
]


@pytest.fixture(scope="module")
def results(spark, pool_runner):
    """Each retrieval computation once, concurrently (iterated MMR greedy
    loops cost ~11 s apiece serially); assertions stay per-test below."""
    def vdf():
        return spark.createDataFrame(_vecs(), "id int, v array<double>")

    return pool_runner({
        "bm25": lambda: bm25_scores(
            spark.createDataFrame(DOCS, "id int, text string"),
            "id", "text", ["quick", "fox"]).collect(),
        "rrf": lambda: rrf_fuse(
            spark.createDataFrame(RRF_ROWS, "ret string, doc int, s double"),
            "ret", "doc", "s").collect(),
        "mmr_diverse": lambda: mmr_select(
            vdf(), "id", "v", [0.8, 0.6], k=3, lam=0.3).collect(),
        "mmr_lam1": lambda: mmr_select(
            vdf(), "id", "v", [1.0, 0.0], k=4, lam=1.0).collect(),
        "mmr_bigk": lambda: mmr_select(
            spark.createDataFrame(_vecs()[:2], "id int, v array<double>"),
            "id", "v", [1.0, 0.0], k=10, lam=0.7).collect(),
    })


def test_bm25_matches_mirror(results):
    docs = DOCS
    got = {r["id"]: r["score"] for r in results["bm25"]}
    assert got == pytest.approx(_bm25_mirror(docs, ["quick", "fox"]), abs=1e-6)
    assert 4 not in got
    assert got[3] > got[1]  # higher tf wins


def test_rrf_fusion(results):
    got = {r["id"]: (r["n_lists"], r["rrf"]) for r in results["rrf"]}
    assert got[2] == (2, round(1 / 62 + 1 / 61, 6))
    assert got[1] == (2, round(1 / 61 + 1 / 63, 6))
    assert got[3] == (2, round(1 / 63 + 1 / 62, 6))
    # doc 2 (rank 2 + rank 1) beats doc 1 (rank 1 + rank 3)
    assert got[2][1] > got[1][1]


def _vecs():
    return [
        (1, [1.0, 0.0]),         # same direction as query
        (2, [0.98, 0.2]),        # near-duplicate of 1
        (3, [0.6, 0.8]),         # diverse, still relevant
        (4, [0.0, 1.0]),         # orthogonal to query
    ]


def test_mmr_prefers_diversity_over_near_duplicate(results):
    # query off every corpus direction (else rel == sim-to-first-pick
    # and step-2 scores tie); low lambda makes diversity decisive
    got = [(r["rank"], r["id"]) for r in results["mmr_diverse"]]
    ids = [i for _, i in got]
    # rel: 3 (0.96) > 2 (0.904) > 1 (0.8) > 4 (0.6); after picking 3 and
    # 1, orthogonal 4 beats near-duplicate 2 on the marginal score
    assert ids == [3, 1, 4]
    assert got[0][0] == 1


def test_mmr_lambda_one_is_pure_relevance(results):
    got = [r["id"] for r in results["mmr_lam1"]]
    assert got == [1, 2, 3, 4]


def test_mmr_k_larger_than_corpus(results):
    assert len(results["mmr_bigk"]) == 2


def test_bad_args(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, "id", "text", [])
    vdf = spark.createDataFrame([(1, [1.0])], "id int, v array<double>")
    with pytest.raises(ValueError):
        mmr_select(vdf, "id", "v", [1.0], k=0)
    with pytest.raises(ValueError):
        mmr_select(vdf, "id", "v", [1.0], k=1, lam=1.5)
