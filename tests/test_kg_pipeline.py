"""KG-construction layer: determinism, span-sequence invariant, mention
strategy equivalence, LSH+CC canonicalization, checkpoint resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.kg.components import connected_components
from kgforge.kg.mentions import detect_mentions
from kgforge.kg.pipeline import build_kg, span_sequence_check
from kgforge.kg.synth import explode_spans, make_spans, synth_docs
from kgforge.kg.vocab import EID_TO_ENTITY, SURFACE_TO_EID

N_DOCS = 300


@pytest.fixture(scope="module")
def docs(spark):
    return synth_docs(spark, N_DOCS, seed=42).persist()


def test_generator_deterministic_across_parallelism(spark):
    """Same (seed, doc_id) → same spans regardless of partition count — the
    property that makes N vs 4N scaling runs comparable."""
    a = synth_docs(spark, 100, seed=42, num_partitions=2).collect()
    b = synth_docs(spark, 100, seed=42, num_partitions=8).collect()
    da = {r["doc_id"]: r["spans"] for r in a}
    db = {r["doc_id"]: r["spans"] for r in b}
    assert da == db


def test_make_spans_pure_function():
    assert make_spans(42, 7) == make_spans(42, 7)
    assert make_spans(42, 7) != make_spans(42, 8)


def test_span_sequence_invariant(docs):
    assert span_sequence_check(docs) == 0


def test_offsets_monotone(docs):
    spans = explode_spans(docs)
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("span_idx")
    bad = spans.withColumn("prev", F.lag("offset").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("offset") <= F.col("prev"))
    )
    assert bad.count() == 0


def test_link_strategies_agree(spark, docs):
    from kgforge.kg.linking import link_mentions

    spans = explode_spans(docs)
    mentions = detect_mentions(spans, "pandas").persist()
    key = ["doc_id", "span_idx", "start", "eid"]
    a = link_mentions(mentions, "sql").select(*key, F.round("score", 9).alias("s"))
    b = link_mentions(mentions, "pandas").select(*key, F.round("score", 9).alias("s"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_mention_strategies_agree(spark, docs):
    spans = explode_spans(docs)
    key = ["doc_id", "span_idx", "start", "surface"]
    a = {tuple(r) for r in detect_mentions(spans, "pandas").select(*key).collect()}
    c = {tuple(r) for r in detect_mentions(spans, "regex").select(*key).collect()}
    assert a == c, f"pandas-only={sorted(a - c)[:5]} regex-only={sorted(c - a)[:5]}"
    b = {tuple(r) for r in detect_mentions(spans, "sql").select(*key).collect()}
    only_a, only_b = a - b, b - a
    assert not only_a and not only_b, (
        f"pandas-only={sorted(only_a)[:5]} sql-only={sorted(only_b)[:5]}"
    )
    assert len(a) > 0


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")], schema="a string, b string"
    )
    comp = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_build_kg_links_hot_entities(spark, docs):
    triples, metrics = build_kg(docs)
    triples = triples.persist()
    n = triples.count()
    assert n > 0 and metrics["n_mentions"] > 0

    # hot entities must dominate mention counts (skew by construction)
    counts = {
        r["subj"].rsplit("/", 1)[-1]: int(r["obj_value"])
        for r in triples.filter(F.col("pred").endswith("mentionCount")).collect()
    }
    hot = sum(counts.get(e, 0) for e in ("p001", "l001", "o001"))
    assert hot > 0.5 * sum(counts.values())

    # every detected surface maps to its vocab entity
    surf = triples.filter(F.col("pred").endswith("surfaceForm")).collect()
    for r in surf:
        eid = r["subj"].rsplit("/", 1)[-1]
        assert SURFACE_TO_EID[r["obj_value"].lower()] == eid

    # near-duplicate surface clustering found at least umlaut/ascii variants
    ndup = triples.filter(F.col("pred").endswith("nearDuplicateOf")).count()
    assert ndup > 0


def test_checkpoint_resume(spark, tmp_path, docs):
    from kgforge.kg.io import last_snapshot, resume_or_run

    path = str(tmp_path / "graph")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        t, _ = build_kg(docs)
        return t

    df1, resumed1 = resume_or_run(spark, path, "kg", "fp1", build)
    assert not resumed1 and calls["n"] == 1
    n1 = df1.count()
    df2, resumed2 = resume_or_run(spark, path, "kg", "fp1", build)
    assert resumed2 and calls["n"] == 1  # skipped — same fingerprint
    assert df2.count() == n1
    snap = last_snapshot(path)
    assert snap["rows"] == n1 and snap["stage"] == "kg"
    df3, resumed3 = resume_or_run(spark, path, "kg", "fp2", build)
    assert not resumed3 and calls["n"] == 2  # input changed → rebuild


def test_kg_to_anonymization_end_to_end(spark, docs, tmp_path):
    """The north-star composition: interleaved docs → KG triples → graph
    write with snapshot → read back → the reference's anonymization
    semantics applied to the entity table (mask canonical names, generalize
    mention counts) → k-anonymity KPI."""
    from kgforge.anonymize.engine import anonymize_triples
    from kgforge.config import config_from_dict
    from kgforge.kg.io import last_snapshot, write_graph
    from kgforge.kg.vocab import KG
    from kgforge.triples import RDF_TYPE

    triples, _ = build_kg(docs)
    path = str(tmp_path / "graph")
    snap = write_graph(triples, path, stage="kg", fingerprint="t")
    assert snap["rows"] == triples.count() and last_snapshot(path)["stage"] == "kg"
    stored = spark.read.parquet(path)

    cfg = config_from_dict(
        {
            KG + "Person": {
                KG + "canonicalName": ("string", "masking"),
                KG + "mentionCount": ("integer", "generalization"),
            }
        }
    )
    out, report = anonymize_triples(stored, cfg, random_seed=1234)

    persons = {
        r["subj"]
        for r in stored.filter(
            (F.col("pred") == RDF_TYPE) & (F.col("obj_value") == KG + "Person")
        ).collect()
    }
    assert persons

    masked = out.filter(F.col("pred") == KG + "canonicalName_masked")
    masked_rows = masked.collect()
    assert {r["subj"] for r in masked_rows} == persons
    assert all(r["obj_value"] == "*****" for r in masked_rows)
    # originals removed (use_adjusted_attributes default keeps suffixed preds)
    assert (
        out.filter(
            (F.col("pred") == KG + "canonicalName")
            & F.col("subj").isin(list(persons))
        ).count()
        == 0
    )
    gen = out.filter(F.col("pred") == KG + "mentionCount_generalized")
    assert {r["subj"] for r in gen.collect()} == persons
    assert report.k_anonymity and all(k >= 1 for k in report.k_anonymity.values())
    assert KG + "Person" in report.k_anonymity


@pytest.mark.slow
def test_canonicalization_paths_agree(spark, docs):
    """Driver union-find (small-vocab fast path) and the distributed
    MinHash-LSH + connected-components path produce the same surface
    clusters on the synthetic vocabulary (96-lane banding: ≥0.998 candidate
    recall at the 0.55 threshold, then exact-Jaccard verify)."""
    a, _ = build_kg(docs)
    b, _ = build_kg(docs, small_canon_threshold=0)
    key = lambda t: {(r["subj"], r["obj_value"]) for r in
                     t.filter(F.col("pred").endswith("nearDuplicateOf")).collect()}
    assert key(a) == key(b) and len(key(a)) > 0


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must join with zero shuffle and
    zero sort — the co-located layout write_bucketed exists for."""
    from kgforge.kg.io import read_table, write_bucketed

    ent = spark.range(0, 1000).select(
        F.col("id").alias("eid"), (F.col("id") % 7).alias("etype")
    )
    men = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("eid"), F.col("id").alias("mention_id")
    )
    write_bucketed(ent, "t_ent_b", "eid", buckets=8)
    write_bucketed(men, "t_men_b", "eid", buckets=8)
    try:
        j = read_table(spark, "t_ent_b").join(read_table(spark, "t_men_b"), "eid")
        # disable broadcast so the join strategy is the bucketed SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = j._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "Exchange" not in plan, plan
        assert j.count() == 5000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ent_b")
        spark.sql("DROP TABLE IF EXISTS t_men_b")


def test_update_kg_equals_batch_rebuild(spark):
    """Incremental maintenance is EXACTLY a batch rebuild: fold a second
    document batch into the first batch's graph and compare the full triple
    set against build_kg over the union corpus — value equality, including
    the recomputed global nearDuplicateOf family and the summed
    mentionCounts."""
    from pyspark.sql import functions as F

    from kgforge.kg.pipeline import build_kg, update_kg
    from kgforge.kg.synth import synth_docs

    docs = synth_docs(spark, 300).persist()
    part = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    d1 = docs.filter(part != 0)
    d2 = docs.filter(part == 0)

    full, _ = build_kg(docs, collect_metrics=False)
    t1, _ = build_kg(d1, collect_metrics=False)
    inc, _ = update_kg(t1, d2)

    want = {tuple(r) for r in full.collect()}
    got = {tuple(r) for r in inc.collect()}
    assert len(want) > 0
    assert got == want, (
        f"missing={list(want - got)[:3]} extra={list(got - want)[:3]}"
    )
    docs.unpersist()


def test_update_kg_stable_labels(spark):
    """stable_labels=True pins cluster labels across increments: pure growth
    never relabels, and a bridge-induced merge keeps the minimum PRIOR label
    even when the fresh min-surface label would differ; cluster membership
    stays identical to the default (rebuild-equivalent) policy."""
    from pyspark.sql import functions as F

    from kgforge.kg.pipeline import KG, _py_shingles, build_kg, update_kg

    def jac(a, b):
        sa, sb = _py_shingles(a), _py_shingles(b)
        return len(sa & sb) / len(sa | sb)

    c1 = ["bbbb-cccc", "bbbb-cccd"]
    c2 = ["dddd-eeee", "dddd-eeef"]
    bridge = "a-bbbb-cccc-dddd-eeee"  # lexicographically BELOW all old labels
    thr = 0.25
    assert jac(*c1) >= thr and jac(*c2) >= thr
    assert max(jac(a, b) for a in c1 for b in c2) < thr
    assert jac(bridge, c1[0]) >= thr and jac(bridge, c2[0]) >= thr
    assert bridge < min(c1 + c2)

    surfaces = c1 + c2 + [bridge]
    catalog = spark.createDataFrame(
        [(s, f"e{i}", s, "Thing") for i, s in enumerate(surfaces)],
        "norm string, eid string, canonical string, etype string",
    )

    def mk_docs(rows):
        return spark.createDataFrame(
            [(d, [("text", t, "", 0)]) for d, t in rows],
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        )

    kw = dict(
        mention_strategy="regex", link_strategy="sql",
        mention_vocab=surfaces, mention_case_insensitive=False,
        catalog=catalog,
    )
    old_docs = mk_docs([(f"d{i}", f"x {s} y") for i, s in enumerate(c1 + c2)])
    t1, _ = build_kg(old_docs, near_dup_threshold=thr, collect_metrics=False,
                     **kw)

    nd = KG + "nearDuplicateOf"
    pref = KG + "surface/"

    def labels(tr):
        return {
            r["subj"][len(pref):]: r["obj_value"][len(pref):]
            for r in tr.filter(F.col("pred") == nd).collect()
        }

    assert labels(t1) == {"bbbb-cccd": "bbbb-cccc", "dddd-eeef": "dddd-eeee"}

    # pure growth (re-mention of an existing surface): labels unchanged
    grown, _ = update_kg(
        t1, mk_docs([("d10", "z bbbb-cccd w")]),
        near_dup_threshold=thr, stable_labels=True, **kw,
    )
    assert labels(grown) == labels(t1)

    # merge: the bridge connects both old clusters.  Stable policy keeps the
    # min PRIOR label (bbbb-cccc); the default rebuild policy relabels to the
    # fresh min surface (the bridge itself).
    merge_docs = mk_docs([("d11", f"z {bridge} w")])
    stable, _ = update_kg(
        t1, merge_docs, near_dup_threshold=thr, stable_labels=True, **kw,
    )
    lab_s = labels(stable)
    assert set(lab_s.values()) == {"bbbb-cccc"}
    assert set(lab_s) == {"bbbb-cccd", "dddd-eeee", "dddd-eeef", bridge}

    default, _ = update_kg(t1, merge_docs, near_dup_threshold=thr, **kw)
    lab_d = labels(default)
    assert set(lab_d.values()) == {bridge}
    # same partition of the vocabulary under both policies: every surface in
    # one merged cluster (label + its members)
    assert set(lab_d) | set(lab_d.values()) == set(lab_s) | set(lab_s.values())
