"""Probe: does the batch suite scale 2->8 cores with a pre-touched heap?

Each lap rebuilds the suite plan (as bench.scaling_core does) so AQE's
materialized-stage reuse can't shortcut execution. Prints per-lap seconds
plus the driver-side plan-build time (analysis only, no job).

Usage: python scripts/scaling_probe.py <cpus> [laps] [fixture_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CPUS = sys.argv[1]
LAPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
FIXT = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/data/sfstats32"

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
import bench

t0 = time.time()
spark = bench.build_spark(CPUS)
startup = round(time.time() - t0, 2)

from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.plans import suite as SU

clips = spark.read.parquet(f"{FIXT}/clips")
dim = spark.read.parquet(f"{FIXT}/allowed_codecs.parquet")

laps, plan_secs = [], []
for _ in range(LAPS):
    t0 = time.time()
    df = SU.suite_verdicts(clips, dim).agg(F.count(F.lit(1)).alias("n"))
    df.schema  # force analysis
    t1 = time.time()
    df.collect()
    t2 = time.time()
    plan_secs.append(round(t1 - t0, 2))
    laps.append(round(t2 - t1, 2))
print(json.dumps({"cpus": int(CPUS), "startup": startup,
                  "plan": plan_secs, "exec": laps}), flush=True)
spark.stop()
