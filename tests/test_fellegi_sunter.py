import math

import pytest

from kgforge.datapipe.blocking import fellegi_sunter_scores


def _df(spark):
    return spark.createDataFrame(
        [
            (1, True, True),
            (2, True, False),
            (3, False, False),
        ],
        "pair int, ag1 boolean, ag2 boolean",
    )


def test_scores_and_decisions(spark):
    fields = [("ag1", 0.9, 0.1), ("ag2", 0.8, 0.2)]
    w1a, w1d = math.log2(9), math.log2(0.1 / 0.9)
    w2a, w2d = math.log2(4), math.log2(0.2 / 0.8)
    out = fellegi_sunter_scores(_df(spark), fields, upper=3.0, lower=0.0)
    got = {r["pair"]: (r["score"], r["decision"]) for r in out.collect()}
    assert got[1] == (round(w1a + w2a, 6), "match")        # ~5.17
    assert got[2] == (round(w1a + w2d, 6), "possible")     # ~1.17
    assert got[3] == (round(w1d + w2d, 6), "non_match")    # ~ -5.17
    assert got[1][0] == round(math.log2(9) + 2.0, 6)


def test_param_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        fellegi_sunter_scores(df, [], 1.0, 0.0)
    with pytest.raises(ValueError):
        fellegi_sunter_scores(df, [("ag1", 0.1, 0.9)], 1.0, 0.0)
    with pytest.raises(ValueError):
        fellegi_sunter_scores(df, [("ag1", 0.9, 0.1)], 0.0, 1.0)
