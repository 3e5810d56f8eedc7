"""Event-time windowed ingest metrics with watermarked late-data handling.

The reference's stream is a replayable ordered simulation with no event time
(SURVEY §2.9), so the core detectors key on sequence order.  A production
ingest feed is NOT ordered: clips arrive minutes late from retrying
uploaders.  This module is the event-time side of the streaming story the
brief asks for — ``withWatermark`` + windowed aggregation:

- per (event-time window, codec) ingest metrics: clip count, mean duration,
  null-transcript rate — the same quantities the batch per-partition stats
  compute (operators/stats.py), re-keyed from Iceberg partition to time
  window;
- the watermark bounds state: windows older than the watermark are
  finalized, emitted (append mode) and EVICTED from the state store —
  without it, a 100 TB/day feed accumulates one state row per window
  forever;
- rows arriving later than the watermark are dropped once their window's
  state has been evicted (counted in numRowsDroppedByWatermark; the
  finalized window is immutable — re-opening it would re-emit and
  double-count downstream).  Per Spark's contract the watermark is a
  best-effort lower bound: a late row whose window state is still live
  (watermark not yet past the window end at the previous batch boundary)
  may still merge — only eviction makes the drop guaranteed.

All aggregation is built-in JVM expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_ingest_metrics(stream: DataFrame, ts_col: str = "ingest_ts",
                            window: str = "1 minute",
                            late_threshold: str = "2 minutes") -> DataFrame:
    """Watermarked per-(window, codec) ingest metrics over a STREAMING
    clips DataFrame carrying an event-time column ``ts_col``.

    Append output mode: a (window, codec) row is emitted exactly once,
    when the watermark passes the window end; rows later than
    ``late_threshold`` behind the max observed event time are dropped."""
    return (stream
            .withWatermark(ts_col, late_threshold)
            .groupBy(F.window(F.col(ts_col), window).alias("w"), "codec")
            .agg(F.count(F.lit(1)).alias("n_clips"),
                 F.round(F.avg("dur_ms"), 3).alias("mean_dur_ms"),
                 F.round(F.avg(F.when(F.col("transcript").isNull(), 1.0)
                               .otherwise(0.0)), 6)
                 .alias("null_transcript_rate"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "codec", "n_clips", "mean_dur_ms",
                    "null_transcript_rate"))


def run_windowed_metrics(spark, samples_dir: str, schema, out_dir: str,
                         checkpoint_dir: str, ts_col: str = "ingest_ts",
                         window: str = "1 minute",
                         late_threshold: str = "2 minutes",
                         max_files_per_trigger: int = 1,
                         available_now: bool = True):
    """File-source wiring for tests/replay: drain ``samples_dir`` through
    the windowed aggregation into a parquet sink (append mode — only
    watermark-finalized windows land)."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(samples_dir))
    res = windowed_ingest_metrics(stream, ts_col, window, late_threshold)
    writer = (res.writeStream.outputMode("append")
              .option("checkpointLocation", checkpoint_dir)
              .format("parquet").option("path", out_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
