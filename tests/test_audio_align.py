"""Unit mirrors for WAV energy segmentation (datapipe/multimodal.py) and
instance-overlap ontology alignment (kg/align.py)."""

from __future__ import annotations

from kgforge.datapipe.multimodal import (
    synth_wav_payloads,
    wav_energy_segments,
    wav_window_energy,
)
from kgforge.kg.align import (
    MICRO,
    align_classes_by_instances,
    best_class_alignment,
)


def _py_samples(doc_id: int, silence_period: int | None):
    n = 400 + doc_id % 100
    out = []
    for i in range(n):
        s = ((doc_id * 31 + i * 97) % 65536) - 32768
        if silence_period is not None and (i // 100) % silence_period == 0:
            s = 0
        out.append(s)
    return out


def _py_energy(doc_id: int, silence_period, window=100):
    s = _py_samples(doc_id, silence_period)
    out = {}
    for w in range((len(s) + window - 1) // window):
        seg = s[w * window:(w + 1) * window]
        out[w] = (len(seg), sum(x * x for x in seg))
    return out


def test_wav_window_energy_matches_python_mirror(spark):
    ids = spark.createDataFrame([(2,), (7,), (50,)], "doc_id long")
    wavs = synth_wav_payloads(ids, silence_period=3)
    got = {
        (r["doc_id"], r["win"]): (r["n_samples"], r["energy"])
        for r in wav_window_energy(wavs).collect()
    }
    exp = {}
    for d in (2, 7, 50):
        for w, v in _py_energy(d, 3).items():
            exp[(d, w)] = v
    assert got == exp
    # silenced blocks read exactly zero energy
    assert got[(2, 0)][1] == 0 and got[(2, 3)][1] == 0
    assert got[(2, 1)][1] > 0


def test_wav_energy_segments_islands(spark):
    ids = spark.createDataFrame([(2,)], "doc_id long")
    # doc 2: n=402 → windows 0..4; wins 0 and 3 silent (period 3)
    wavs = synth_wav_payloads(ids, silence_period=3)
    segs = sorted(
        (r["seg_start_win"], r["seg_end_win"], r["n_windows"])
        for r in wav_energy_segments(wav_window_energy(wavs)).collect()
    )
    assert segs == [(1, 2, 2), (4, 4, 1)]


def test_wav_no_silence_one_segment(spark):
    ids = spark.createDataFrame([(5,)], "doc_id long")
    wavs = synth_wav_payloads(ids)  # no silencing
    segs = wav_energy_segments(wav_window_energy(wavs)).collect()
    assert len(segs) == 1
    n = 400 + 5 % 100
    assert (segs[0]["seg_start_win"], segs[0]["seg_end_win"]) == (
        0, (n + 99) // 100 - 1)


def test_align_classes_by_instances_exact_counts(spark):
    a = spark.createDataFrame(
        [(i, "c1") for i in range(1, 6)] + [(i, "c2") for i in range(6, 11)],
        "inst int, cls string",
    )
    b = spark.createDataFrame(
        [(1, "d1"), (2, "d1"), (3, "d1"), (4, "d1"), (6, "d1"),
         (5, "d2"), (7, "d2"), (8, "d2"), (9, "d2"), (10, "d2"),
         # duplicate membership collapses
         (1, "d1")],
        "inst int, cls string",
    )
    got = {
        (r["cls_a"], r["cls_b"]): (r["n_common"], r["n_a"], r["n_b"],
                                   r["jaccard_micro"])
        for r in align_classes_by_instances(a, b).collect()
    }
    assert got[("c1", "d1")] == (4, 5, 5, 4 * MICRO // 6)
    assert got[("c1", "d2")] == (1, 5, 5, 1 * MICRO // 9)
    assert got[("c2", "d1")] == (1, 5, 5, 1 * MICRO // 9)
    assert got[("c2", "d2")] == (4, 5, 5, 4 * MICRO // 6)
    best = {r["cls_a"]: r["cls_b"]
            for r in best_class_alignment(
                align_classes_by_instances(a, b)).collect()}
    assert best == {"c1": "d1", "c2": "d2"}


def test_best_alignment_tiebreak_smallest_cls_b(spark):
    a = spark.createDataFrame([(1, "c"), (2, "c")], "inst int, cls string")
    b = spark.createDataFrame(
        [(1, "z"), (2, "z"), (1, "m"), (2, "m")], "inst int, cls string")
    best = best_class_alignment(align_classes_by_instances(a, b)).collect()
    assert len(best) == 1 and best[0]["cls_b"] == "m"


def test_align_plan_is_jvm_only(spark):
    a = spark.createDataFrame([(1, "c")], "inst int, cls string")
    b = spark.createDataFrame([(1, "d")], "inst int, cls string")
    plan = (best_class_alignment(align_classes_by_instances(a, b))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_audio_segments_single_arrow_stage(spark):
    from kgforge.datapipe.multimodal import synth_wav_payloads
    ids = spark.createDataFrame([(2,)], "doc_id long")
    seg = wav_energy_segments(wav_window_energy(
        synth_wav_payloads(ids, silence_period=3)))
    plan = seg._jdf.queryExecution().executedPlan().toString()
    # synth + window-energy are the only Python stages; the island merge
    # and aggregation stay JVM
    assert plan.count("MapInPandas") == 2
