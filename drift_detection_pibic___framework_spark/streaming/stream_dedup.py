"""Watermark-bounded streaming deduplication of an ingest feed.

A production clip feed delivers duplicates by design: uploaders retry on
timeout, backfills replay days, and the same clip arrives via multiple
crawl routes.  Batch dedup (operators/dedup.py) handles the corpus at
rest; THIS module admits each identity exactly once at ingest time, with
state the watermark keeps bounded — the unbounded-state trap of plain
``dropDuplicates`` on a stream is one state row per EVER-SEEN key, which
at 10^12 clips is the whole corpus resident in the state store.

``dropDuplicatesWithinWatermark`` keeps a key's state only until the
watermark passes its event time + the late threshold: a duplicate landing
within the horizon is dropped; after eviction the key re-admits (correct
for retry/replay dedup, where duplicates cluster within minutes — the
long-horizon identity check remains the batch digest index,
operators/dedup.py DedupIndex, run downstream).

Two identities are supported:
- transport identity (``clip_id``): the retry/replay case;
- content identity (md5 of codec-normalized payload metadata + transcript):
  catches the same content re-uploaded under a fresh clip_id within the
  horizon.

Both are narrow JVM expressions; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_by_id(stream: DataFrame, id_col: str = "clip_id",
                ts_col: str = "ingest_ts",
                late_threshold: str = "2 minutes") -> DataFrame:
    """Admit each ``id_col`` exactly once per watermark horizon (retry /
    replay dedup).  State per live key: one row, evicted once the
    watermark passes its event time + ``late_threshold``."""
    return (stream.withWatermark(ts_col, late_threshold)
            .dropDuplicatesWithinWatermark([id_col]))


def dedup_by_content(stream: DataFrame, ts_col: str = "ingest_ts",
                     late_threshold: str = "2 minutes",
                     cols=("codec", "sr_hz", "dur_ms",
                           "transcript")) -> DataFrame:
    """Admit each content digest exactly once per watermark horizon: the
    same clip re-uploaded under a fresh clip_id within the horizon is
    dropped.  The digest is md5 over the normalized identity columns
    (null-tagged so ('a', null) cannot collide with ('anull', ...))."""
    digest = F.md5(F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                  for c in cols]))
    return (stream.withColumn("content_digest", digest)
            .withWatermark(ts_col, late_threshold)
            .dropDuplicatesWithinWatermark(["content_digest"]))


def run_dedup_stream(spark, samples_dir: str, schema, out_dir: str,
                     checkpoint_dir: str, id_col: str = "clip_id",
                     ts_col: str = "ingest_ts",
                     late_threshold: str = "2 minutes",
                     max_files_per_trigger: int = 1,
                     available_now: bool = True):
    """File-source wiring for tests/replay: drain ``samples_dir`` through
    id-dedup into a parquet sink (append mode)."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(samples_dir))
    res = dedup_by_id(stream, id_col, ts_col, late_threshold)
    writer = (res.writeStream.outputMode("append")
              .option("checkpointLocation", checkpoint_dir)
              .format("parquet").option("path", out_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
