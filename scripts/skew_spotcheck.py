"""Skew-degradation spot-check (round-4 verdict item 5): build_kg over the
default hot-key corpus (hottest entity ~31% of all mentions — past the
verdict's ~20% hot-key regime) vs a uniform-entity control corpus of the
SAME doc count and span/word stream, at the same parallelism.

The salted two-phase aggregation in kg/pipeline.py is supposed to make the
hot-key regime cost roughly what the uniform regime costs; this measures it
(target: skewed/uniform docs-per-second ratio >= 0.5).  Results go in
BENCH.md.

Usage: python scripts/skew_spotcheck.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _corpus(variant: str, n_docs: int) -> str:
    path = f"/tmp/kgforge_skewcheck_{variant}_{n_docs}"
    if os.path.isfile(os.path.join(path, "_SUCCESS")):
        return path
    from bench import _session
    from kgforge.kg.synth import synth_docs

    spark = _session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    synth_docs(
        spark, n_docs, num_partitions=64,
        uniform_entities=(variant == "uniform"),
    ).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def _run(cpus: int, path: str) -> tuple[float, int]:
    from bench import _session, _warmup
    from kgforge.kg.pipeline import build_kg

    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)
    docs = spark.read.parquet(path)
    t0 = time.time()
    triples, _ = build_kg(docs, collect_metrics=False)
    n = triples.count()
    dt = time.time() - t0
    spark.stop()
    return dt, n


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from bench import _cpu_capacity_probe

    out: dict = {"n_docs": n_docs, "cpus": cpus,
                 "probe": _cpu_capacity_probe()["efficiency_2w_to_8w"]}
    for variant in ("uniform", "skewed"):
        path = _corpus(variant, n_docs)
        # best-of-2: the host throttles unpredictably
        s1, n1 = _run(cpus, path)
        s2, n2 = _run(cpus, path)
        assert n1 == n2, f"nondeterministic {variant}: {n1} vs {n2}"
        sec = min(s1, s2)
        out[variant] = {
            "seconds": round(sec, 3),
            "triples": n1,
            "docs_per_sec": round(n_docs / sec, 1),
        }
    out["skewed_over_uniform_docs_per_sec"] = round(
        out["skewed"]["docs_per_sec"] / out["uniform"]["docs_per_sec"], 4
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
