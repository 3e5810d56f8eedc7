"""Extra benchmarks for the optimization round (guide §1.4): per-query
noop-sink isolation with analysis-time split, plan dumps, and targeted
stage breakdowns.  bench.py is FROZEN for driver measurement; everything
exploratory lives here.

Usage:
  python bench_extra.py --isolate         # noop-sink laps + analysis split
  python bench_extra.py --plans           # dump explain('formatted') to plans/r06
  python bench_extra.py --dedup-breakdown # stage-by-stage dedup_corpus timing
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import SF_DIR, CPUS, build_spark, canary_mb_s  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _targets(spark):
    """(name, builder) for every bench query, as DataFrame builders where
    possible (so the noop sink times computation, not the sink)."""
    from pyspark.sql import functions as F

    from drift_detection_pibic___framework_spark.operators import (
        dedup, invariant, multimodal, profile as PR, quarantine as QR,
        similarity, sketch_agg, uniqueness)
    from drift_detection_pibic___framework_spark.operators.detectors import (
        kernels)
    from drift_detection_pibic___framework_spark.plans import suite
    from drift_detection_pibic___framework_spark.sources import generators as G

    label = G.sf_label_from_dir(SF_DIR)
    d = G.ensure_fixtures(label)
    clips = spark.read.parquet(f"{d}/clips")
    dim = spark.read.parquet(f"{d}/allowed_codecs.parquet")
    streams = spark.read.parquet(f"{d}/drift_streams.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    return {
        "q_batch_checks": lambda: suite.suite_verdicts(clips, dim),
        "q_violations": lambda: suite.suite_violations(clips, dim),
        "q_invariant": lambda: invariant.invariant_results_filepairs(
            spark, f"{d}/clips", f"{d}/clips_ref").filter("not passed"),
        "q_detectors": lambda: kernels.detections_only(
            kernels.detect(streams)),
        "q_hll_global": lambda: uniqueness.global_distinct_estimate(clips),
        "q_minhash_lsh": lambda: dedup.minhash_near_duplicates(
            docs, threshold=0.2, num_hashes=16, bands=8),
        "q_dedup_corpus": lambda: dedup.dedup_corpus(
            docs, jaccard_threshold=0.7),
        "q_knn": lambda: similarity.brute_force_topk(
            emb, emb.filter("vec_id < 10"), k=5),
        "q_audio_features": lambda: multimodal.audio_features(clips),
        "q_quarantine": lambda: QR.quarantine_summary(clips, dim),
        "q_standardize": lambda: multimodal.audio_standardize(clips, 1000),
        "q_band_energy": lambda: multimodal.audio_band_energy(clips),
        "q_profile": lambda: PR.suggest_constraints(
            clips, cols=[c for c in PR.profilable_columns(clips)
                         if c not in ("rid", "part")]),
        "q_dropouts": lambda: multimodal.audio_dropouts(clips),
    }


def isolate(names=None, reps: int = 4):
    """Per query: analysis (schema) time + noop-sink laps with canaries."""
    spark = build_spark(CPUS)
    targets = _targets(spark)
    out = {}
    for name, mk in targets.items():
        if names and name not in names:
            continue
        spark.sparkContext.setJobDescription(name)
        laps, cans, analysis = [], [], []
        for _ in range(reps):
            cans.append(canary_mb_s())
            t0 = time.time()
            df = mk()
            df.schema
            t1 = time.time()
            _noop(df)
            t2 = time.time()
            analysis.append(round(t1 - t0, 3))
            laps.append(round(t2 - t1, 3))
        out[name] = {"analysis": analysis, "exec": laps,
                     "canary": cans,
                     "exec_min": min(laps), "analysis_min": min(analysis)}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print("TOTALS " + json.dumps(
        {k: v["exec_min"] for k, v in out.items()}))
    return out


def dump_plans(names=None, tag="before"):
    spark = build_spark(CPUS)
    targets = _targets(spark)
    os.makedirs("plans/r06", exist_ok=True)
    for name, mk in targets.items():
        if names and name not in names:
            continue
        try:
            df = mk()
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # builders that materialize eagerly
            p = f"explain failed: {e}"
        with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
            f.write(p)
        print(f"wrote plans/r06/{name}_{tag}.txt", flush=True)
    spark.stop()


def dedup_breakdown():
    """Stage-by-stage timing of dedup_corpus internals."""
    from pyspark.sql import Window, functions as F

    from drift_detection_pibic___framework_spark.operators import dedup
    spark = build_spark(CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    res = {}

    def lap(name, fn, reps=3):
        laps, cans = [], []
        for _ in range(reps):
            cans.append(canary_mb_s())
            t0 = time.time()
            fn()
            laps.append(round(time.time() - t0, 3))
        res[name] = {"laps": laps, "canary": cans, "min": min(laps)}
        print(json.dumps({name: res[name]}), flush=True)

    w = Window.partitionBy("_digest").orderBy(F.col("doc_id"))
    surv = (docs.withColumn("_digest", F.md5(dedup.norm_text("text")))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_digest", "_rn"))
    lap("exact_phase", lambda: _noop(surv))
    lap("signatures", lambda: _noop(
        dedup.minhash_signatures(surv, "text", 16, 3)))
    lap("near_dups_full", lambda: dedup.minhash_near_duplicates(
        surv, threshold=0.7, num_hashes=16, bands=4).unpersist())
    pairs = dedup.minhash_near_duplicates(
        surv, threshold=0.7, num_hashes=16, bands=4)
    lap("connected_components", lambda: _noop(
        dedup.connected_components(pairs)))
    lap("keep_canonical_anti", lambda: _noop(
        dedup.keep_canonical(surv, pairs)))
    lap("full_dedup_corpus", lambda: dedup.dedup_corpus(
        docs, jaccard_threshold=0.7).count())
    spark.stop()
    print("BREAKDOWN " + json.dumps({k: v["min"] for k, v in res.items()}))


if __name__ == "__main__":
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or None
    if "--plans" in sys.argv:
        tag = "after" if "--after" in sys.argv else "before"
        dump_plans(names, tag)
    elif "--dedup-breakdown" in sys.argv:
        dedup_breakdown()
    else:
        isolate(names)
