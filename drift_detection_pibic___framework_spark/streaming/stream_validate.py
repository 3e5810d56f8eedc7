"""Structured Streaming front-end for the validation engine.

The reference is a replayable single-threaded stream simulation with no
event time or late data (SURVEY §2.9) — its unit of progress maps to the
Iceberg partition, so the CORE engine is batch-per-partition with manifest
resume (plans/runner.py).  This module is the continuous-ingest variant:
new clip files landing in the table directory are validated as they arrive.

Design:
- ``readStream`` file source over the clips directory (schema pinned — a
  streaming source cannot infer);
- ``foreachBatch``: each micro-batch runs the SAME batch-check operators
  (stats/null-rate/referential per partition observed in the batch) and
  writes verdict rows to a parquet sink partitioned by epoch.  foreachBatch
  is at-least-once — a crash between the write and the checkpoint commit
  replays the epoch — so the write OVERWRITES the epoch's own partition
  (dynamic partitionOverwriteMode): a replayed epoch replaces its previous
  output instead of duplicating it, making the sink idempotent and the
  pipeline exactly-once end-to-end;
- drift / sequential-detector series monitoring is owned by the BATCH
  runner (plans/runner.py): a micro-batch need not contain the baseline
  window, and the prequential steppers advance in partition order there.
  The streaming front-end emits per-batch verdicts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

CLIPS_STREAM_SCHEMA = StructType([
    StructField("rid", LongType()),
    StructField("clip_id", StringType()),
    StructField("bytes", BinaryType()),
    StructField("sr_hz", IntegerType()),
    StructField("dur_ms", IntegerType()),
    StructField("codec", StringType()),
    StructField("transcript", StringType()),
    StructField("part", IntegerType()),
])


def stream_clips(spark: SparkSession, clips_dir: str,
                 max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(CLIPS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(clips_dir))


def micro_batch_verdicts(batch: DataFrame, dim: DataFrame) -> DataFrame:
    """The per-micro-batch check suite: the ``streaming_safe`` subset of
    the single check registry (plans/suite.py)."""
    from ..plans import suite
    return suite.streaming_suite_verdicts(batch, dim)


def validate_stream(spark: SparkSession, clips_dir: str, dim_path: str,
                    out_dir: str, checkpoint_dir: str,
                    available_now: bool = True):
    """Start the streaming validation; returns the StreamingQuery.
    ``available_now=True`` drains everything currently in the directory and
    stops (test/replay mode); False runs continuously."""
    dim = spark.read.parquet(dim_path)
    stream = stream_clips(spark, clips_dir)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        v = micro_batch_verdicts(batch, dim) \
            .withColumn("epoch", F.lit(epoch_id))
        # idempotent per epoch: dynamic overwrite touches only the epoch
        # partitions present in v, so an at-least-once replay of this
        # micro-batch replaces its own earlier output (ADVICE r1).
        (v.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("epoch")
         .parquet(out_dir))

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
