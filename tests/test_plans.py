"""Physical-plan quality gates — the properties that matter at 100 TB.

These assert on `.explain` output, not timings: broadcast joins where a side
is dimension-sized, parquet filter pushdown for selective scans, and zero
Python evaluation nodes in the JVM-only paths (a BatchEvalPython/ArrowEval
node in a hot path is a 10-100x regression waiting for scale).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_customer(spark):
    plan = _plan(entry.queries()["q3_topk"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_dims(spark):
    plan = _plan(entry.queries()["q5_region_revenue"](spark, SF))
    # supplier/nation/region are all dimension-sized → at least two
    # broadcast joins must survive planning
    assert plan.count("BroadcastHashJoin") >= 2


def test_q1_pushes_shipdate_filter(spark):
    plan = _plan(entry.queries()["q1_pricing"](spark, SF))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_q6_prunes_columns(spark):
    plan = _plan(entry.queries()["q6_forecast"](spark, SF))
    # ReadSchema must not include uninvolved wide columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_returnflag" not in read_schema
    assert "l_quantity" in read_schema


def test_jvm_link_path_has_no_python(spark):
    from kgforge.kg.linking import link_mentions
    from kgforge.kg.mentions import detect_mentions
    from kgforge.kg.synth import explode_spans, synth_docs

    spans = explode_spans(synth_docs(spark, 50))
    linked = link_mentions(detect_mentions(spans, "regex"), "sql")
    plan = _plan(linked)
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, f"{marker} found in JVM-only link path"


def test_simhash_is_jvm_only(spark):
    plan = _plan(entry.queries()["simhash_pairs"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


def test_minhash_band_join_not_cartesian(spark):
    plan = _plan(entry.queries()["minhash_clusters"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_generalize_has_no_global_single_partition_sort(spark):
    # W1 global rank must be range-partition + offsets, not a 1-partition
    # window (which would serialize the sort at scale)
    plan = _plan(entry.queries()["generalize_acctbal"](spark, SF))
    assert "SinglePartition" not in plan.split("Window")[0] or "Window" not in plan


def test_range_join_is_equi_key_not_nested_loop(spark):
    plan = _plan(entry.queries()["events_followup_range_join"](spark, SF))
    # equi-join on user id with the range predicate as residual — never a
    # nested-loop over the full pair space
    assert "Join" in plan and "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_doc_mentions_and_links_are_jvm_only(spark):
    for q in ("doc_mentions", "doc_links"):
        plan = _plan(entry.queries()[q](spark, SF))
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan, f"{marker} in {q}"


def test_build_kg_plan_is_clean(spark):
    from kgforge.kg.pipeline import build_kg
    from kgforge.kg.synth import synth_docs

    t, _ = build_kg(synth_docs(spark, 100), collect_metrics=False)
    plan = _plan(t)
    # only Arrow mapInPandas stages (synthesis + mention detection) may run
    # Python; no row-wise eval nodes, no cartesian joins
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_generalize_plan_flat_at_large_g(spark):
    """W3 scale gate: boundary extraction must not inline a literal IN-list or
    run a driver loop over g — plan size stays O(1) as g grows to 10^4."""
    from kgforge.anonymize.ops import generalize

    n = 20_000
    col_df = spark.range(n).select(
        F.concat(F.lit("http://ex.org/r"), F.col("id")).alias("subj"),
        F.col("id").cast("double").cast("string").alias("obj_value"),
    )
    plans = {}
    for g in (10, 10_000):
        df = generalize(col_df, "http://ex.org/attr", "double", g, n)
        plans[g] = df._jdf.queryExecution().optimizedPlan().toString()
        assert " IN (" not in plans[g]
    # plan text must not grow with g (allow slack for the differing digits)
    assert len(plans[10_000]) < len(plans[10]) + 2_000
    # and the boundary join must be a broadcast (ranked side never shuffles
    # for the boundary lookup)
    big = generalize(col_df, "http://ex.org/attr", "double", 10_000, n)
    phys = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys


def test_generalize_large_g_bounds_match_driver_formula(spark):
    """Value check at g=1000: DataFrame-built bounds equal the scalar
    median/format formulas computed in plain Python."""
    from kgforge.anonymize.ops import generalize
    from kgforge.anonymize.values import format_bound, median_value

    n, g = 5_000, 1_000
    vals = [((i * 37) % n) * 0.5 for i in range(n)]
    col_df = spark.createDataFrame(
        [(f"http://ex.org/r{i:05d}", str(v)) for i, v in enumerate(vals)],
        "subj string, obj_value string",
    )
    out = generalize(col_df, "http://ex.org/a", "double", g, n)
    got_min = {
        r["subj"]: r["obj_value"]
        for r in out.filter(F.col("pred").endswith("min")).collect()
    }
    sv = sorted(vals)
    for b in (1, 17, 500, g - 1):
        lb = b * n // g
        lower = median_value("double", sv[lb - 1] if lb > 0 else None, sv[lb])
        lex, _ = format_bound("double", lower)
        assert got_min[f"http://ex.org/a_{b}"] == lex, b


def test_scrub_chunk_lang_paths_are_jvm_only(spark):
    """The new corpus-prep operators must stay inside codegen: no Python
    eval nodes in pii_scrub / doc_chunks / lang_profiles / dedup_keep."""
    for q in ("pii_scrub", "doc_chunks", "lang_profiles"):
        plan = _plan(entry.queries()[q](spark, SF))
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan, f"{marker} in {q}"


def test_new_tpch_queries_broadcast_dims(spark):
    q = entry.queries()
    assert _plan(q["q10_returned_items"](spark, SF)).count("BroadcastHashJoin") >= 1
    assert _plan(q["q19_disjunctive_revenue"](spark, SF)).count("BroadcastHashJoin") >= 1
    assert _plan(q["q7_volume_shipping"](spark, SF)).count("BroadcastHashJoin") >= 2


def test_scalar_subquery_shapes_stay_broadcast(spark):
    # the 1-row threshold/aggregate sides must broadcast, never a shuffled
    # cartesian over the fact table
    q = entry.queries()
    for name in ("q11_important_parts", "q15_top_supplier", "q22_dormant_customers"):
        plan = _plan(q[name](spark, SF))
        assert "CartesianProduct" not in plan, name


def test_corpus_ops_are_jvm_only(spark):
    # vocab/tfidf/mix-sampling hot paths stay in codegen — no Python workers
    q = entry.queries()
    for name in ("vocab_topk", "tfidf_keywords", "source_mix"):
        plan = _plan(q[name](spark, SF))
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan, (name, marker)


def test_completed_tpch_queries_broadcast_dims(spark):
    # session-2 TPC-H completions: dimension sides must broadcast
    q = entry.queries()
    assert _plan(q["q2_min_cost_supplier"](spark, SF)).count("BroadcastHashJoin") >= 2
    assert _plan(q["q8_market_share"](spark, SF)).count("BroadcastHashJoin") >= 2
    assert _plan(q["q9_product_profit"](spark, SF)).count("BroadcastHashJoin") >= 2
    assert _plan(q["q21_waiting_suppliers"](spark, SF)).count("BroadcastHashJoin") >= 1


def test_session2_corpus_ops_are_jvm_only(spark):
    # repetition signals, duplicate spans, stratified sampling: pure codegen
    q = entry.queries()
    for name in ("repetition", "dup_spans", "stratified_sample"):
        plan = _plan(q[name](spark, SF))
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan, (name, marker)
        assert "CartesianProduct" not in plan, name


def test_semantic_dedup_broadcasts_centroids_no_cartesian_pairs(spark):
    # centroid assignment broadcasts the (tiny) centroid table; the pair
    # stage must be an equi-join on the cell id, never an all-pairs product
    plan = _plan(entry.queries()["semantic_dedup"](spark, SF))
    assert "CartesianProduct" not in plan


def test_round3_ops_plan_quality(spark):
    q = entry.queries()
    # lm_xent: model tables broadcast (charset^3-bounded), nothing Python,
    # no sort-merge join of the data against the model
    plan = _plan(q["lm_xent"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    for marker in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert marker not in plan, marker

    # url_domains: pure JVM regex path
    plan = _plan(q["url_domains"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker

    # audio_triples: the decode UDF must appear ONCE (an explode over
    # families, not a union that re-executes the Arrow pipeline per family)
    plan = _plan(q["audio_triples"](spark, SF))
    assert plan.count("MapInPandas") == 2, plan.count("MapInPandas")  # synth+decode


def test_kg_triples_geo_broadcasts_catalog(spark):
    plan = _plan(entry.queries()["kg_triples_geo"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_session4_ops_plan_quality(spark):
    q = entry.queries()
    # weighted_sample: global top-n must be a TakeOrdered (per-partition
    # heaps + k-row merge), never a full Sort, and pure JVM
    plan = _plan(q["weighted_sample"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker

    # kg_void: profiling aggregate over the checkpointed triple table —
    # hash aggregate, no python, no cartesian
    plan = _plan(q["kg_void"](spark, SF))
    assert "HashAggregate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker

    # url_canonical: regex/array canonicalization entirely in codegen
    plan = _plan(q["url_canonical"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker


def test_session6_ops_plan_quality(spark):
    q = entry.queries()
    # zorder_stats: pure int64 codegen end to end — no python, no
    # cartesian, and a hash aggregate for the skip stats
    plan = _plan(q["zorder_stats"](spark, SF))
    assert "HashAggregate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker

    # edit_dist_pairs: segment blocking + JVM levenshtein — no python
    plan = _plan(q["edit_dist_pairs"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker

    # neighbor sampling: the per-(seed, src) top-k must plan as a
    # WindowGroupLimit (hubs cut to the fan-out map-side), never a full
    # per-group sort of hub adjacency
    from kgforge.datapipe.sketch import _stage2
    from pyspark.sql import Window

    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 3 + 1) % 50}") for i in range(50)],
        "src string, dst string",
    )
    cand = e.withColumn("seed", F.lit("n0")).select(
        "seed", "src", "dst",
        _stage2(
            F.concat_ws("\x1f", "seed", "src", "dst", F.lit("0")), 31, 1009
        ).alias("_h"),
    )
    w = Window.partitionBy("seed", "src").orderBy("_h", "dst")
    pick = cand.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= 3
    )
    assert "WindowGroupLimit" in _plan(pick)


def test_session7_ops_plan_quality(spark):
    q = entry.queries()
    # cdc_merge: the per-key window runs over the CHANGELOG only and the
    # base passes through one anti-join — no python, no cartesian, and
    # exactly one Window (the latest-event pick)
    plan = _plan(q["cdc_merge"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker
    assert plan.count("Window") >= 1

    # gap fill: the sequence+explode grid must be a distributed Generate
    # node, the carry a per-key (never single-partition) window
    plan = _plan(q["events_gap_fill"](spark, SF))
    assert "Generate explode" in plan
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker

    # group-wise OLS: ONE hash aggregate with partial (map-side) combine,
    # all JVM
    plan = _plan(q["ols_trend"](spark, SF))
    assert "HashAggregate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker

    # rank swap / sorted-neighborhood: the rank discipline means no
    # global single-partition window survives in the executed plan
    for name in ("rank_swap_acctbal", "snm_pairs"):
        plan = _plan(q[name](spark, SF))
        assert "SinglePartition" not in plan, name
        for marker in ("BatchEvalPython", "ArrowEvalPython",
                       "CartesianProduct"):
            assert marker not in plan, f"{name}: {marker}"

    # MAD fences: group-partitioned windows only, all JVM
    plan = _plan(q["mad_prices"](spark, SF))
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker

    # skyline: per-range-partition sweep — no global window, no python
    plan = _plan(q["orders_skyline"](spark, SF))
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker


def test_session7_batch2_plan_quality(spark):
    q = entry.queries()
    # target encoding: one hash aggregate + join back, all JVM
    plan = _plan(q["target_encoding"](spark, SF))
    assert "HashAggregate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker

    # pseudonymize: dictionary built on DISTINCT values with the rank
    # discipline — no single-partition window in the executed plan
    plan = _plan(q["pseudonymize_names"](spark, SF))
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker

    # attribution: per-user range windows, one exchange, no join of
    # conversions against touches
    plan = _plan(q["events_attribution"](spark, SF))
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                   "SortMergeJoin"):
        assert marker not in plan, marker

    # mondrian result: per-region windows only, all JVM
    plan = _plan(q["mondrian_k10"](spark, SF))
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker


def test_session7_batch3_plan_quality(spark):
    q = entry.queries()
    # quantile normalization: rank discipline — no single-partition
    # window; dense-position equi-join, all JVM
    plan = _plan(q["quantile_norm_balances"](spark, SF))
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker

    # FD violations: aggregate + equi-join back, all JVM, no cartesian
    plan = _plan(q["fd_check"](spark, SF))
    assert "HashAggregate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker

    # Fellegi-Sunter over SNM blocking: the scoring is pure projection —
    # no python, no cartesian, score folded into codegen
    plan = _plan(q["fs_scores"](spark, SF))
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker


def test_session7_retrieval_plan_quality(spark):
    q = entry.queries()
    # BM25: term frequencies are array expressions — NO explode/Generate
    # for tf, one broadcast stats join, all JVM
    plan = _plan(q["bm25_search"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker

    # RRF: per-retriever windows (partitioned by the retriever tag) +
    # one doc groupBy, all JVM, no cartesian
    plan = _plan(q["rrf_fusion"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker

    # set-similarity join: prefix-filter equi-joins only — never a
    # cartesian pair product
    plan = _plan(q["setsim_pairs"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker


def test_session7_batch5_plan_quality(spark):
    q = entry.queries()
    # golden records: the whole ER chain stays JVM — blocking join,
    # literal-weight scoring, component loop, one survivorship groupBy
    plan = _plan(q["golden_records"](spark, SF))
    # struct-valued max (the longest rule) plans as SortAggregate — the
    # groupBy is still one partial-aggregated pass either way
    assert "HashAggregate" in plan or "SortAggregate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker

    # weighted median: per-group cumulative window, never global
    plan = _plan(q["weighted_median_prices"](spark, SF))
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker


def test_session7_batch6_plan_quality(spark):
    q = entry.queries()
    # allen join: equi-join on the key with interval residual — a hash
    # join, never a nested loop over the pair space
    plan = _plan(q["allen_relations"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                   "BroadcastNestedLoopJoin"):
        assert marker not in plan, marker

    # soundex: one codegen fold per row + a hash aggregate — no UDF
    plan = _plan(q["phonetic_blocks"](spark, SF))
    assert "HashAggregate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker

    # cusum: stacked per-key windows, never single-partition
    plan = _plan(q["events_cusum"](spark, SF))
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker


def test_session7_batch7_plan_quality(spark):
    q = entry.queries()
    # pairwise ER eval: contingency aggregates only — never a pair set
    plan = _plan(q["er_quality"](spark, SF))
    assert "HashAggregate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker

    # KMV sketches: per-group top-k must plan as WindowGroupLimit (the
    # map-side cut), pair estimates as array expressions over sketch rows
    plan = _plan(q["kmv_source_overlap"](spark, SF))
    assert "WindowGroupLimit" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker


def test_session9_ops_plan_quality(spark):
    q = entry.queries()
    # compaction planner: pure metadata job — one window over the partition
    # key, no python nodes, no joins at all
    plan = _plan(q["compaction_bins"](spark, SF))
    assert "Window" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                   "SortMergeJoin", "BroadcastHashJoin"):
        assert marker not in plan, marker

    # sequence mining: everything keyed by the journey key — the per-key
    # position window and the stats self-joins, never a cartesian and
    # never a global (empty-partition-spec) window
    plan = _plan(q["seq_patterns"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker
    assert "SinglePartition" not in plan

    # winnowing: exploded gram stream + ONE bounded sliding window per doc,
    # all JVM (poly-hash fold is codegen aggregate-expr)
    plan = _plan(q["winnow_fp"](spark, SF))
    assert "Window" in plan
    assert "SinglePartition" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker


def test_session12_ops_plan_quality(spark):
    q = entry.queries()
    # rectangle motifs: equi-joins only on the oriented edge keys — never
    # a cartesian, never python; the whole decomposition is JVM codegen
    from kgforge.kg.motifs import square_pairs

    plan = _plan(square_pairs(
        spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker

    # IVM merge: the base view is already aggregated — the merge is two
    # hash aggregates (delta partial + union merge), no join of any kind,
    # no python, no global window
    plan = _plan(q["ivm_orders"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                   "SortMergeJoin", "BroadcastHashJoin"):
        assert marker not in plan, marker
    assert "SinglePartition" not in plan

    # risk metrics: one map-side-combinable groupBy (+ a global one-row
    # reduce for the summary) — no joins, no python
    for name in ("reid_risk", "reid_summary"):
        plan = _plan(q[name](spark, SF))
        for marker in ("BatchEvalPython", "ArrowEvalPython",
                       "CartesianProduct", "SortMergeJoin",
                       "BroadcastHashJoin"):
            assert marker not in plan, (name, marker)

    # frozen-bounds application: pure map stage — the classifier fold is a
    # broadcast-literal expression, ZERO exchanges over the new data
    from kgforge.anonymize.incremental import apply_bounds

    supp = spark.read.parquet(f"{SF}/supplier.parquet")
    plan = _plan(apply_bounds(supp, "s_acctbal", [0.0, 1000.0, 5000.0]))
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker


def test_copurchase_no_python_and_no_cartesian(spark):
    # the recommender is pure JVM and its pair join is keyed by basket —
    # an item-product would show up as a cartesian/BNLJ
    plan = _plan(entry.queries()["copurchase_topk"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan


def test_gini_tree_broadcasts_splits(spark):
    # the chosen splits are 1-row DataFrames crossed in via broadcast —
    # never a shuffled join, never a driver collect
    plan = _plan(entry.queries()["gini_tree"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


def test_woe_stays_jvm(spark):
    plan = _plan(entry.queries()["woe_segments"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan
