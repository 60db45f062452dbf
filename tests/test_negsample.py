import pytest

from kgforge.kg.negsample import negative_samples

_P = 2147483647


def _poly(s: str, mult: int) -> int:
    acc = 0
    for c in s:
        acc = (acc * mult + ord(c)) % _P
    return acc


def _stage2(s: str, m1: int, m2: int) -> int:
    return _poly(str(_poly(s, m1)), m2)


def _mirror(triples, k):
    ents = sorted({s for s, _, _ in triples} | {o for _, _, o in triples})
    n = len(ents)
    true = set(triples)
    out = set()
    for s, p, o in triples:
        for lane in range(k):
            pick = _stage2("\x1f".join((s, p, o, str(lane))), 31, 1009) % n
            neg = ents[pick]
            if (s, p, neg) not in true:
                out.add((s, p, o, lane, neg))
    return out


def test_negative_samples_mirror(spark):
    triples = [
        (f"e{i}", "knows", f"e{(3 * i + 1) % 40}") for i in range(40)
    ] + [(f"e{i}", "type", "Person") for i in range(0, 40, 3)]
    df = spark.createDataFrame(triples, "subj string, pred string, obj string")
    got = {
        (r["subj"], r["pred"], r["obj"], r["lane"], r["neg_obj"])
        for r in negative_samples(df, k=3).collect()
    }
    assert got == _mirror(triples, 3)
    assert len(got) > 0


def test_negative_samples_filtered_setting(spark):
    # a true (s, p, neg_obj) collision must never appear in the output
    triples = [("a", "p", "b"), ("a", "p", "c"), ("b", "p", "c")]
    df = spark.createDataFrame(triples, "subj string, pred string, obj string")
    rows = negative_samples(df, k=4).collect()
    true = set(triples)
    for r in rows:
        assert (r["subj"], r["pred"], r["neg_obj"]) not in true


def test_negative_samples_deterministic_across_partitioning(spark):
    triples = [(f"s{i}", "r", f"t{i % 7}") for i in range(30)]
    df1 = spark.createDataFrame(triples, "subj string, pred string, obj string")
    df2 = df1.repartition(13)
    a = {tuple(r) for r in negative_samples(df1, k=2).collect()}
    b = {tuple(r) for r in negative_samples(df2, k=2).collect()}
    assert a == b and len(a) > 0
