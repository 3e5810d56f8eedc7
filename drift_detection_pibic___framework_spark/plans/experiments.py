"""Experiment-grid runner — the Spark analogue of the reference's
``experimento/ExperimentoDrift.py:23-65`` (series x detector x repetition
grid -> per-run metrics table -> groupby mean/std summary, persisted like
``utils/FileManager.py:44-55`` writes its CSV results).

Spark-first shape:
- the repetition axis is materialized as DATA, not a driver loop: the
  streams table is cross-joined with a tiny rep dimension and each rep
  gets independent deterministic noise (hash-derived from
  (stream_id, seq, rep) — partition-layout-independent, unlike
  ``F.rand``, so the grid is reproducible under any repartitioning);
- every (stream, rep) cell is one ``applyInPandas`` group through the
  SAME detector kernels the engine uses everywhere
  (operators/detectors/kernels.py) — grid parallelism = streams x reps;
- detection metrics (count, first-detection delay vs the known change
  point, false alarms) and the mean/std summary are pure JVM
  aggregations over the kernel output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.detectors import kernels

#: known change points of the synthetic streams (generators.py); None =
#: no drift injected (every detection is a false alarm).
CHANGE_POINTS = {
    "abrupt_mean": 1000,
    "gradual_mean": 800,
    "variance_shift": 1000,
    "recurring": 700,
    "no_drift": None,
}

NOISE_AMPLITUDE = 0.02


def _rep_noise(rep_col, amplitude: float):
    """Deterministic per-(stream, seq, rep) uniform noise in
    [-amplitude/2, amplitude/2): first 8 md5 hex chars -> uint32 -> [0,1).
    Same trick as the dedup hashes — reproducible on any engine and any
    partitioning."""
    u = (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("stream_id"), F.col("seq"), rep_col)), 1, 8), 16, 10)
        .cast("double") / F.lit(float(1 << 32)))
    return (u - 0.5) * amplitude


def replicated_grid(streams: DataFrame, reps: int,
                    noise: float = NOISE_AMPLITUDE) -> DataFrame:
    """streams x reps with per-rep noise; stream_id becomes
    '<stream>#<rep>' so each cell is its own detector group."""
    rep_dim = F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
    g = streams.select("stream_id", "seq", "value", "err", rep_dim)
    nz = _rep_noise(F.col("rep"), noise)
    return g.select(
        F.concat_ws("#", "stream_id", "rep").alias("stream_id"),
        "seq",
        (F.col("value") + nz).alias("value"),
        F.abs(F.col("err") + nz).alias("err"))


def grid_results(spark: SparkSession, streams: DataFrame,
                 detectors=None, reps: int = 3,
                 noise: float = NOISE_AMPLITUDE) -> DataFrame:
    """Per-(stream, detector, rep) metrics: detections, first-detection
    delay past the known change point, false alarms before it."""
    grid = replicated_grid(streams, reps, noise)
    res = kernels.detect(grid, detectors=detectors)
    split = F.split(res["stream_id"], "#")
    r = res.select(split.getItem(0).alias("stream_id"),
                   split.getItem(1).cast("int").alias("rep"),
                   "detector", "seq", "flag")
    cp_rows = [(k, v) for k, v in CHANGE_POINTS.items()]
    cps = spark.createDataFrame(cp_rows, "stream_id string, cp long")
    r = r.join(F.broadcast(cps), "stream_id", "left")
    det_after = F.when(r["flag"] & (F.col("cp").isNotNull())
                       & (r["seq"] >= F.col("cp")), r["seq"])
    return (r.groupBy("stream_id", "detector", "rep")
            .agg(F.sum(F.col("flag").cast("long")).alias("n_detections"),
                 F.min(F.when(r["flag"], r["seq"])).alias("first_detection"),
                 (F.min(det_after) - F.first("cp")).alias("delay"),
                 F.sum((F.col("flag")
                        & ((F.col("cp").isNull())
                           | (r["seq"] < F.col("cp"))))
                       .cast("long")).alias("false_alarms")))


def grid_summary(results: DataFrame) -> DataFrame:
    """The ExperimentoDrift groupby mean/std over repetitions."""
    return (results.groupBy("stream_id", "detector")
            .agg(F.count(F.lit(1)).alias("n_reps"),
                 F.round(F.avg("n_detections"), 4).alias("mean_detections"),
                 F.round(F.stddev_samp("n_detections"), 4)
                 .alias("std_detections"),
                 F.round(F.avg("delay"), 4).alias("mean_delay"),
                 F.round(F.stddev_samp("delay"), 4).alias("std_delay"),
                 F.round(F.avg("false_alarms"), 4).alias("mean_false_alarms"))
            .orderBy("stream_id", "detector"))


def run_grid(spark: SparkSession, streams: DataFrame, out_dir: str = None,
             detectors=None, reps: int = 3) -> DataFrame:
    """Full experiment: grid -> per-run metrics -> summary; persists both
    tables when ``out_dir`` is given (the FileManager CSV-results
    analogue, as parquet)."""
    results = grid_results(spark, streams, detectors=detectors, reps=reps)
    summary = grid_summary(results)
    if out_dir:
        results.write.mode("overwrite").parquet(f"{out_dir}/grid_results")
        summary.write.mode("overwrite").parquet(f"{out_dir}/grid_summary")
    return summary
