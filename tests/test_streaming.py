"""Structured Streaming validation: drain the fixture directory with
availableNow micro-batches; verdicts must match the batch engine, and the
checkpoint must make a second start a no-op (exactly-once)."""

import pytest


@pytest.fixture()
def dirs(tmp_path):
    return {"out": str(tmp_path / "out"), "ckpt": str(tmp_path / "ckpt")}


def _run(spark, fixture_dir, dirs):
    from drift_detection_pibic___framework_spark.streaming import stream_validate
    q = stream_validate.validate_stream(
        spark, f"{fixture_dir}/clips", f"{fixture_dir}/allowed_codecs.parquet",
        dirs["out"], dirs["ckpt"])
    q.awaitTermination(300)
    return spark.read.parquet(dirs["out"])


def test_streaming_verdicts_match_batch(spark, fixture_dir, clips,
                                        allowed_codecs, dirs):
    got = _run(spark, fixture_dir, dirs)
    # with maxFilesPerTrigger=4 a partition is never split across batches
    # (one file per partition), so per-partition verdicts equal batch mode
    from drift_detection_pibic___framework_spark.operators import (
        referential, stats)
    st = stats.partition_column_stats(clips)
    want = (stats.null_rate_verdicts(st)
            .unionByName(stats.range_verdicts(st, "sr_hz", 8000, 48000))
            .unionByName(referential.referential_verdicts(clips,
                                                          allowed_codecs)))
    g = {(r["part"], r["check_name"]): r["passed"]
         for r in got.collect()}
    w = {(r["part"], r["check_name"]): r["passed"]
         for r in want.collect()}
    assert g == w


def test_streaming_checkpoint_exactly_once(spark, fixture_dir, dirs):
    a = _run(spark, fixture_dir, dirs).count()
    from drift_detection_pibic___framework_spark.streaming import stream_validate
    q2 = stream_validate.validate_stream(
        spark, f"{fixture_dir}/clips", f"{fixture_dir}/allowed_codecs.parquet",
        dirs["out"], dirs["ckpt"])
    q2.awaitTermination(300)
    assert spark.read.parquet(dirs["out"]).count() == a  # nothing re-emitted


def test_streaming_epoch_replay_is_idempotent(spark, fixture_dir, clips,
                                              allowed_codecs, tmp_path):
    """foreachBatch is at-least-once: simulate a crash between the sink
    write and the checkpoint commit by invoking the epoch write twice.
    The epoch-partitioned dynamic overwrite must leave ONE copy."""
    from drift_detection_pibic___framework_spark.streaming import stream_validate
    out = str(tmp_path / "out")
    batch = clips.filter("part < 4")

    def write_epoch(epoch_id):
        from pyspark.sql import functions as F
        v = (stream_validate.micro_batch_verdicts(batch, allowed_codecs)
             .withColumn("epoch", F.lit(epoch_id)))
        (v.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("epoch").parquet(out))

    write_epoch(0)
    once = spark.read.parquet(out).count()
    write_epoch(0)                                   # replayed epoch
    write_epoch(1)                                   # next epoch appends
    assert spark.read.parquet(out).filter("epoch = 0").count() == once
    assert spark.read.parquet(out).count() == 2 * once
