"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the north_rule scaling-efficiency evidence
(same job at two parallelism levels — the sandbox proxy for N vs 4N
executors).  Prints ONE JSON line.

Usage: python bench.py            # full run
       python bench.py --quick    # skip the scaling pass
"""

from __future__ import annotations

import json
import os
import sys
import time


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"kgforge-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )


def _kg_run(spark, sf_dir: str) -> tuple[float, int]:
    """Flagship parity run: testdata docs → triples; returns (seconds, n)."""
    from kgforge.kg.pipeline import build_kg, docs_from_testdata

    t0 = time.time()
    docs = docs_from_testdata(spark, sf_dir)
    triples, _metrics = build_kg(docs)
    n = triples.count()
    return time.time() - t0, n


def _warmup(spark) -> None:
    """Untimed tiny KG build: spawns the Python worker pool and fills the
    codegen cache so measured runs reflect steady-state throughput (the
    cluster-equivalent of long-lived executors), not one-time session setup."""
    from kgforge.kg.pipeline import build_kg
    from kgforge.kg.synth import synth_docs

    t, _ = build_kg(synth_docs(spark, 1000), collect_metrics=False)
    t.count()


def _kg_synth_run(spark, n_docs: int) -> tuple[float, int]:
    """Throughput run: deterministic synthetic corpus sized so compute (not
    per-stage fixed overhead) dominates — the honest basis for the N→4N
    scaling-efficiency evidence."""
    from kgforge.kg.pipeline import build_kg
    from kgforge.kg.synth import synth_docs

    t0 = time.time()
    docs = synth_docs(spark, n_docs)
    triples, _ = build_kg(docs, collect_metrics=False)
    n = triples.count()
    return time.time() - t0, n


BENCH_QUERIES = [
    "q1_pricing",
    "q3_topk",
    "q5_region_revenue",
    "generalize_acctbal",
    "generalize_orderdate",
    "top3_orders_per_customer",
    "sessionize_events",
    "dedup_exact",
    "token_stats",
    "quality",
    "sim_topk",
    "minhash_clusters",
    "simhash_pairs",
]


def main() -> None:
    quick = "--quick" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    timings: dict[str, float] = {}

    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)

    # headline relational / datapipe queries (count() forces full execution)
    for name in BENCH_QUERIES:
        t0 = time.time()
        qmap[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    # flagship KG construction (parity corpus) at N cores
    kg_sec_n, n_triples = _kg_run(spark, sf_dir)
    timings["kg_triples"] = round(kg_sec_n, 3)

    # throughput + scaling on the synthetic corpus (compute-dominated)
    kg_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "100000"))
    synth_sec_large, synth_n = _kg_synth_run(spark, kg_docs)
    tput_large = synth_n / synth_sec_large
    spark.stop()

    scaling = None
    if not quick:
        small = max(cpus // 4, 1)
        spark_small = _session(small)
        spark_small.sparkContext.setLogLevel("ERROR")
        _warmup(spark_small)
        synth_sec_small, n2 = _kg_synth_run(spark_small, kg_docs)
        spark_small.stop()
        assert n2 == synth_n, f"nondeterministic triple count {n2} != {synth_n}"
        tput_small = n2 / synth_sec_small
        scaling = {
            "kg_docs": kg_docs,
            "cores_small": small,
            "cores_large": cpus,
            "seconds_small": round(synth_sec_small, 3),
            "seconds_large": round(synth_sec_large, 3),
            "triples_per_sec_small": round(tput_small, 1),
            "triples_per_sec_large": round(tput_large, 1),
            # throughput scaling efficiency from N to 4N cores
            "efficiency": round(tput_large / (tput_small * (cpus / small)), 4),
        }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg_triples": n_triples,
        "kg_synth_docs": kg_docs,
        "kg_synth_triples": synth_n,
        "kg_triples_per_sec": round(tput_large, 1),
        "cpus": cpus,
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
