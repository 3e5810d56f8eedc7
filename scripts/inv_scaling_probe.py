"""Targeted re-measure of the invariant-kernel scaling leg.

The full `bench.py --scaling` run of 2026-08-17 13:39 produced clean
suite/minhash legs but an invariant leg whose lap blocks contain 75-110 s
throttle outliers amid 12-22 s laps (see BENCH/BASELINE.md) — the
page-fault throttle poisoned every lap of one config's block in BOTH
interleaved passes.  This probe re-runs ONLY the invariant leg (the
python-worker Arrow kernel: decode + SNR over ~1.2 GB payload, zero
shuffle) with the same measurement rules (warm min-lap, interleaved
passes, pre-touched heap) plus a per-block canary so the artifact itself
records whether the window was clean.

Usage:  python scripts/inv_scaling_probe.py            # orchestrator
        SPARK_GRAFT_CPUS=2 python scripts/inv_scaling_probe.py --worker
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

LAPS = 4


def worker(cpus: str) -> dict:
    from drift_detection_pibic___framework_spark.operators import invariant
    from drift_detection_pibic___framework_spark.sources import generators as G

    spark = bench.build_spark(cpus)
    d_clips = G.ensure_fixtures(G.sf_label_from_dir(bench.SF_DIR))

    def inv() -> int:
        return invariant.invariant_results_filepairs(
            spark, f"{d_clips}/clips", f"{d_clips}/clips_ref") \
            .filter("not passed").count()

    canary0 = bench.canary_mb_s()
    laps = []
    for _ in range(LAPS):
        t0 = time.time()
        inv()
        laps.append(round(time.time() - t0, 2))
    canary1 = bench.canary_mb_s()
    n = spark.read.parquet(f"{d_clips}/clips").count()
    spark.stop()
    return {"cpus": int(cpus), "laps": laps, "inv_sec": min(laps),
            "n_clips": n, "canary_mb_s": [round(canary0), round(canary1)],
            "clips_per_sec": round(n / min(laps), 1)}


def main() -> None:
    results = {}
    for cpus in ("2", "8", "2", "8"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        p = subprocess.run([sys.executable, __file__, "--worker"],
                           env=env, capture_output=True, text=True,
                           timeout=3600)
        r = json.loads(p.stdout.strip().splitlines()[-1])
        prev = results.get(cpus)
        if prev is None:
            results[cpus] = r
        else:
            prev["laps"] += r["laps"]
            prev["canary_mb_s"] += r["canary_mb_s"]
            if r["inv_sec"] < prev["inv_sec"]:
                prev["inv_sec"] = r["inv_sec"]
                prev["clips_per_sec"] = r["clips_per_sec"]
    eff = round((results["2"]["inv_sec"] / results["8"]["inv_sec"]) / 4.0, 3)
    print(json.dumps({"eff_2_to_8_invariant": eff, "results": results}))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        print(json.dumps(worker(os.environ.get("SPARK_GRAFT_CPUS", "8"))))
    else:
        main()
