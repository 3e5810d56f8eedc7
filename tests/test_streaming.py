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


# -------------------------------------------------------------------------
# stateful streaming detectors (applyInPandasWithState)
# -------------------------------------------------------------------------

SAMPLES_SCHEMA = ("stream_id string, seq long, value double, err double")


def _chunk_files(spark, pdf, d, chunks):
    """Write the drift-stream series as seq-ordered chunk files: file k
    holds every stream's k-th slice (the ordered-source contract)."""
    import os
    os.makedirs(d, exist_ok=True)
    bounds = sorted(pdf["seq"].unique())
    per = len(bounds) // chunks + 1
    for k in range(chunks):
        lo, hi = k * per, min((k + 1) * per, len(bounds))
        if lo >= hi:
            break
        part = pdf[pdf["seq"].isin(bounds[lo:hi])]
        spark.createDataFrame(part).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/chunk-{k:02d}")
        # file source wants files, not dirs: move the part file up
        import glob
        import shutil
        f = glob.glob(f"{d}/chunk-{k:02d}/part-*.parquet")[0]
        shutil.move(f, f"{d}/{k:02d}.parquet")
        shutil.rmtree(f"{d}/chunk-{k:02d}")


def test_stream_detectors_match_batch_kernel(spark, fixture_dir, tmp_path):
    """The applyInPandasWithState detector suite over 3 micro-batches must
    emit EXACTLY the batch kernel's rows for the same ordered series —
    stepper state carries across micro-batches via the state store."""
    import pandas as pd
    from drift_detection_pibic___framework_spark.operators.detectors import (
        kernels)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_detect)

    pdf = pd.read_parquet(f"{fixture_dir}/drift_streams.parquet")
    keep = pdf[pdf["stream_id"].isin(sorted(pdf["stream_id"].unique())[:2])]
    d = str(tmp_path / "samples")
    _chunk_files(spark, keep, d, chunks=3)

    dets = ["ddm", "page_hinkley"]
    q = stream_detect.run_detect_stream(
        spark, d, SAMPLES_SCHEMA, str(tmp_path / "out"),
        str(tmp_path / "ckpt"), detectors=dets)
    q.awaitTermination(300)

    got = (spark.read.parquet(str(tmp_path / "out"))
           .orderBy("stream_id", "detector", "seq").collect())
    want = (kernels.detect(spark.createDataFrame(keep), dets)
            .orderBy("stream_id", "detector", "seq").collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_stream_detectors_resume_from_checkpoint(spark, fixture_dir,
                                                 tmp_path):
    """New files landing after a drain continue from the CARRIED state:
    two availableNow sessions over chunks (0,1) then (2) must together
    equal one batch pass — i.e. the state store persists steppers."""
    import pandas as pd
    from drift_detection_pibic___framework_spark.operators.detectors import (
        kernels)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_detect)

    pdf = pd.read_parquet(f"{fixture_dir}/drift_streams.parquet")
    keep = pdf[pdf["stream_id"] == sorted(pdf["stream_id"].unique())[0]]
    d = str(tmp_path / "samples")
    bounds = sorted(keep["seq"].unique())
    cut = bounds[len(bounds) * 2 // 3]
    _chunk_files(spark, keep[keep["seq"] <= cut], d, chunks=2)

    args = (spark, d, SAMPLES_SCHEMA, str(tmp_path / "out"),
            str(tmp_path / "ckpt"))
    q1 = stream_detect.run_detect_stream(*args, detectors=["ddm"])
    q1.awaitTermination(300)
    n1 = spark.read.parquet(str(tmp_path / "out")).count()

    _chunk_files(spark, keep[keep["seq"] > cut],
                 str(tmp_path / "late"), chunks=1)
    import shutil
    shutil.move(str(tmp_path / "late" / "00.parquet"), f"{d}/99.parquet")
    q2 = stream_detect.run_detect_stream(*args, detectors=["ddm"])
    q2.awaitTermination(300)

    got = (spark.read.parquet(str(tmp_path / "out"))
           .orderBy("seq").collect())
    assert len(got) > n1                    # second session emitted rows
    want = (kernels.detect(spark.createDataFrame(keep), ["ddm"])
            .orderBy("seq").collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


# -------------------------------------------------------------------------
# event-time windowed metrics with watermark (late-data handling)
# -------------------------------------------------------------------------

def test_windowed_metrics_watermark_drops_late_rows(spark, tmp_path):
    """4 availableNow micro-batches: (1) rows in window 10:00; (2) 10:05
    advancing the watermark to 10:03 (window 10:00 is finalized + evicted
    at the end of this batch); (3) 10:09 advancing it to 10:07; (4) a LATE
    10:00:30 row whose window state is gone — dropped by the watermark
    (Spark contract: a late row is only guaranteed dropped once its
    window's state is evicted; while state is live it may still merge).
    The finalized 10:00 windows must count only batch-1 rows."""
    import glob
    import os
    import shutil
    from datetime import datetime

    from drift_detection_pibic___framework_spark.streaming import (
        stream_metrics)

    d = str(tmp_path / "in")
    rows_by_file = [
        [(datetime(2026, 1, 1, 10, 0, 10), "pcm16", 100, "a"),
         (datetime(2026, 1, 1, 10, 0, 20), "pcm16", 300, None),
         (datetime(2026, 1, 1, 10, 0, 40), "mulaw", 200, "b")],
        [(datetime(2026, 1, 1, 10, 5, 0), "pcm16", 500, "c")],
        [(datetime(2026, 1, 1, 10, 9, 0), "alaw", 400, "d")],
        [(datetime(2026, 1, 1, 10, 0, 30), "pcm16", 900, "late-dropped")],
    ]
    os.makedirs(d, exist_ok=True)
    for k, rows in enumerate(rows_by_file):
        df = spark.createDataFrame(
            rows, "ingest_ts timestamp, codec string, dur_ms int, "
                  "transcript string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/tmp")
        shutil.move(glob.glob(f"{d}/tmp/part-*.parquet")[0],
                    f"{d}/{k:02d}.parquet")
        shutil.rmtree(f"{d}/tmp")
        # deterministic source order: the file stream lists oldest-first
        os.utime(f"{d}/{k:02d}.parquet", (1000000 + k * 100,) * 2)

    q = stream_metrics.run_windowed_metrics(
        spark, d, "ingest_ts timestamp, codec string, dur_ms int, "
                  "transcript string",
        str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    dropped = sum(op.get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress
                  for op in p.get("stateOperators", []))
    got = {(r.window_start.strftime("%H:%M"), r.codec):
           (r.n_clips, r.mean_dur_ms, r.null_transcript_rate)
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert dropped == 1                     # the late 10:00:30 row
    # the 10:00 windows finalized WITHOUT the late 900ms row
    assert got[("10:00", "pcm16")] == (2, 200.0, 0.5)
    assert got[("10:00", "mulaw")] == (1, 200.0, 0.0)
    # 10:05 finalized too (end 10:06 <= final watermark 10:07); the 10:09
    # window stays open past the drain and is NOT emitted in append mode
    assert got[("10:05", "pcm16")] == (1, 500.0, 0.0)
    assert ("10:09", "alaw") not in got


def test_stream_detectors_multichunk_group(spark, fixture_dir, tmp_path):
    """A group whose micro-batch spans MANY Arrow chunks (tiny
    maxRecordsPerBatch) must still process in seq order — the kernel
    gathers all chunks and sorts once, instead of trusting chunk order."""
    import pandas as pd
    from drift_detection_pibic___framework_spark.operators.detectors import (
        kernels)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_detect)

    pdf = pd.read_parquet(f"{fixture_dir}/drift_streams.parquet")
    keep = pdf[pdf["stream_id"] == sorted(pdf["stream_id"].unique())[0]]
    d = str(tmp_path / "samples")
    _chunk_files(spark, keep, d, chunks=1)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "64")
    try:
        q = stream_detect.run_detect_stream(
            spark, d, SAMPLES_SCHEMA, str(tmp_path / "out"),
            str(tmp_path / "ckpt"), detectors=["ddm"])
        q.awaitTermination(300)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)

    got = (spark.read.parquet(str(tmp_path / "out"))
           .orderBy("seq").collect())
    want = (kernels.detect(spark.createDataFrame(keep), ["ddm"])
            .orderBy("seq").collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Retry/replay dedup: (1) c1,c2 admitted; (2) a retry duplicate of c1
    within the horizon is dropped while c3 (fresh, advances the watermark)
    is admitted; (3) after the watermark passes c1's eviction horizon, a
    REPLAYED c1 re-admits (bounded state: the key was evicted, long-term
    identity belongs to the batch digest index).  Same-id rows inside one
    batch dedupe too."""
    import glob
    import os
    import shutil
    from datetime import datetime

    from drift_detection_pibic___framework_spark.streaming import (
        stream_dedup)

    d = str(tmp_path / "in")
    rows_by_file = [
        [(datetime(2026, 1, 1, 10, 0, 0), "c1", "pcm16"),
         (datetime(2026, 1, 1, 10, 0, 1), "c1", "pcm16"),   # in-batch dup
         (datetime(2026, 1, 1, 10, 0, 5), "c2", "mulaw")],
        [(datetime(2026, 1, 1, 10, 1, 0), "c1", "pcm16"),   # retry dup
         (datetime(2026, 1, 1, 10, 3, 0), "c3", "alaw")],
        # watermark after batch 2 = 10:01 (10:03 - 2min); c1's state
        # (event 10:00 + 2min horizon) evicts once a batch RUNS with
        # watermark > 10:02 — eviction applies the batch-START watermark,
        # so c4 advances it and c5's batch performs the eviction
        [(datetime(2026, 1, 1, 10, 30, 0), "c4", "pcm16")],
        [(datetime(2026, 1, 1, 10, 31, 0), "c5", "alaw")],
        [(datetime(2026, 1, 1, 10, 32, 0), "c1", "pcm16")],  # replay: re-admits
    ]
    os.makedirs(d, exist_ok=True)
    for k, rows in enumerate(rows_by_file):
        df = spark.createDataFrame(
            rows, "ingest_ts timestamp, clip_id string, codec string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/tmp")
        shutil.move(glob.glob(f"{d}/tmp/part-*.parquet")[0],
                    f"{d}/{k:02d}.parquet")
        shutil.rmtree(f"{d}/tmp")
        os.utime(f"{d}/{k:02d}.parquet", (1000000 + k * 100,) * 2)

    q = stream_dedup.run_dedup_stream(
        spark, d, "ingest_ts timestamp, clip_id string, codec string",
        str(tmp_path / "out"), str(tmp_path / "ckpt"))
    assert q.awaitTermination(300)

    out = spark.read.parquet(str(tmp_path / "out")).collect()
    admitted = sorted((r.clip_id, r.ingest_ts.strftime("%H:%M:%S"))
                      for r in out)
    assert admitted == [("c1", "10:00:00"), ("c1", "10:32:00"),
                        ("c2", "10:00:05"), ("c3", "10:03:00"),
                        ("c4", "10:30:00"), ("c5", "10:31:00")]


def test_stream_dedup_by_content(spark, tmp_path):
    """Content-identity dedup: same payload under a fresh clip_id within
    the horizon is dropped; different payload with the same clip_id is
    admitted (content digest, not transport id, is the key)."""
    from datetime import datetime

    from drift_detection_pibic___framework_spark.streaming import (
        stream_dedup)

    rows = [
        (datetime(2026, 1, 1, 10, 0, 0), "a1", "pcm16", 16000, 100, "hi"),
        (datetime(2026, 1, 1, 10, 0, 5), "a2", "pcm16", 16000, 100, "hi"),
        (datetime(2026, 1, 1, 10, 0, 9), "a1", "mulaw", 8000, 100, "hi"),
        (datetime(2026, 1, 1, 10, 0, 7), "a3", "pcm16", 16000, 100, None),
        (datetime(2026, 1, 1, 10, 0, 8), "a4", "pcm16", 16000, 100, None),
    ]
    src = spark.createDataFrame(
        rows, "ingest_ts timestamp, clip_id string, codec string, "
              "sr_hz int, dur_ms int, transcript string")
    d = str(tmp_path / "in")
    src.coalesce(1).write.parquet(d)
    stream = (spark.readStream
              .schema("ingest_ts timestamp, clip_id string, codec string, "
                      "sr_hz int, dur_ms int, transcript string")
              .parquet(d))
    q = (stream_dedup.dedup_by_content(stream)
         .writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .format("parquet").option("path", str(tmp_path / "out"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)
    got = sorted(r.clip_id
                 for r in spark.read.parquet(str(tmp_path / "out")).collect())
    # a2 is a content dup of a1@pcm16; a4 of a3 (null-tagged digest);
    # a1@mulaw is DIFFERENT content under a seen clip_id -> admitted
    assert got == ["a1", "a1", "a3"]


def test_stream_gate_commits_and_flags_drift(spark, fixture_dir, tmp_path):
    """Each micro-batch becomes one sidecar commit; later epochs (drifted
    fixture parts 8+) must flag on the moment/quantile gates; a restart
    from the checkpoint appends NO duplicate commits."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_validate)

    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    gate_root = str(tmp_path / "g")
    q = stream_validate.validate_stream_with_gate(
        spark, f"{fixture_dir}/clips",
        f"{fixture_dir}/allowed_codecs.parquet", out, ckpt, gate_root)
    assert q.awaitTermination(300)

    io = ParquetTableIO(gate_root)
    snaps = io.snapshots(stream_validate.GATE_TABLE)
    assert len(snaps) == 4          # 16 part files / maxFilesPerTrigger=4
    sides = io.snapshot_stats(stream_validate.GATE_TABLE)
    assert len(sides) == 4 and all(s["rows"] == 800 for s in sides)

    gates = spark.read.parquet(out + "_gates")
    rows = gates.collect()
    # epoch 0 has a single commit -> every report is empty by contract
    assert not [r for r in rows if r.epoch == 0]
    flagged = {(r.epoch, r.gate, r.subject) for r in rows if r.flagged}
    # Epochs are the fixture parts in order ([0-3],[4-7],[8-11],[12-15]):
    # generators._normalize_part_mtimes makes file mtimes strictly
    # increasing by part, and the file source batches by mtime.  (The
    # original assertions here were written against one generation's
    # accidental parallel-writer mtime scramble and encoded a layout
    # that never deterministically held.)
    # dur_ms drift is injected in parts 8-15 = epochs 2 and 3: both trip
    # the moment AND the KS quantile gate vs the rolling baseline
    assert {(2, "moments", "dur_ms"), (2, "quantile", "dur_ms"),
            (3, "moments", "dur_ms"), (3, "quantile", "dur_ms")} <= flagged
    # epoch 1 (parts 4-7): opus first appears in part 5 -> NEW-ARRIVAL
    # category flag; and its dur min (111 ms) undercuts the baseline's
    # 112 ms -> a (tiny but real) moment range escape
    assert (1, "category", "codec=opus") in flagged
    assert (1, "moments", "dur_ms") in flagged
    # part 11's opus is already known by epoch 2 -> no repeat flag
    assert (2, "category", "codec=opus") not in flagged
    # sr_hz stays quiet EVERYWHERE: the baseline epoch itself drew
    # 192 kHz outliers (parts 2-3), so later outliers (parts 10, 14)
    # are in-range — the gate must not re-flag an already-seen extreme
    assert not any(s == "sr_hz" for _, _, s in flagged)
    # uniqueness stays quiet: every epoch's clip_ids are fresh
    assert not any(g == "uniqueness" for _, g, _ in flagged)

    # restart on the same checkpoint: no new epochs, no duplicate commits
    q2 = stream_validate.validate_stream_with_gate(
        spark, f"{fixture_dir}/clips",
        f"{fixture_dir}/allowed_codecs.parquet", out, ckpt, gate_root)
    assert q2.awaitTermination(300)
    assert len(io.snapshots(stream_validate.GATE_TABLE)) == 4


def test_stream_gate_compaction_bounds_sidecars_same_flags(
        spark, fixture_dir, tmp_path):
    """compact_after bounds gate metadata at O(compact_keep) sidecar files
    while leaving the per-epoch gate verdicts unchanged (fold(baseline +
    kept) == fold(all) for mergeable summaries)."""
    import os

    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_validate)

    def run(sub, **kw):
        q = stream_validate.validate_stream_with_gate(
            spark, f"{fixture_dir}/clips",
            f"{fixture_dir}/allowed_codecs.parquet",
            str(tmp_path / sub / "o"), str(tmp_path / sub / "c"),
            str(tmp_path / sub / "g"), **kw)
        assert q.awaitTermination(300)
        flags = {(r.epoch, r.gate, r.subject) for r in
                 spark.read.parquet(str(tmp_path / sub / "o_gates"))
                 .collect() if r.flagged}
        stats_dir = os.path.join(str(tmp_path / sub / "g"),
                                 stream_validate.GATE_TABLE, "_stats")
        return flags, sorted(os.listdir(stats_dir))

    plain_flags, plain_files = run("plain")
    compact_flags, compact_files = run("compact", compact_after=2,
                                       compact_keep=1)
    assert compact_flags == plain_flags
    assert len(plain_files) == 4                      # one per epoch
    assert len(compact_files) <= 3                    # baseline + keep + new
    assert "_baseline.json" in compact_files


def test_stream_upsert_applies_changes_latest_wins(spark, tmp_path):
    """Change-feed files -> one upsert commit per micro-batch; the merged
    table must equal latest-wins per key across the whole feed, and a
    checkpoint restart must not duplicate commits."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_upsert)

    feed = str(tmp_path / "feed")
    # two files = two availableNow micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 20), ("a", 2, 11)],   # in-batch retry of a
        "k string, ver int, v int").coalesce(1) \
        .write.parquet(feed + "/f1")
    spark.createDataFrame(
        [("b", 3, 21), ("c", 1, 30)],
        "k string, ver int, v int").coalesce(1) \
        .write.parquet(feed + "/f2")
    stream = (spark.readStream.schema("k string, ver int, v int")
              .option("maxFilesPerTrigger", 1)
              .parquet(feed + "/*"))
    io = ParquetTableIO(str(tmp_path / "t"))
    q = stream_upsert.apply_changes_into(
        spark, stream, io, "state", "k", "ver",
        str(tmp_path / "ckpt"))
    assert q.awaitTermination(300)

    got = {r.k: (r.ver, r.v)
           for r in io.read_appended(spark, "state").collect()}
    assert got == {"a": (2, 11), "b": (3, 21), "c": (1, 30)}
    n_commits = len(io.snapshots("state"))
    assert n_commits == 2

    # restart from the same checkpoint: no new commits
    stream2 = (spark.readStream.schema("k string, ver int, v int")
               .option("maxFilesPerTrigger", 1)
               .parquet(feed + "/*"))
    q2 = stream_upsert.apply_changes_into(
        spark, stream2, io, "state", "k", "ver",
        str(tmp_path / "ckpt"))
    assert q2.awaitTermination(300)
    assert len(io.snapshots("state")) == n_commits


def test_stream_gate_acoustic_flags_upsampled_epoch(
        spark, fixture_dir, tmp_path):
    """acoustic=True commits rolloff/flatness profile columns per epoch;
    an epoch of RESAMPLED (bandwidth-collapsed) clips must trip the
    acoustic gates while the clean epoch before it stays quiet on them —
    payload drift caught from sidecars, no audio re-read."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from drift_detection_pibic___framework_spark.operators import multimodal
    from drift_detection_pibic___framework_spark.streaming import (
        stream_validate)

    stream_dir = tmp_path / "clips"
    stream_dir.mkdir()
    # epochs 0-1: two clean fixture part files (one file per trigger)
    for i, src in enumerate(["part-0000.parquet", "part-0001.parquet"]):
        shutil.copy(f"{fixture_dir}/clips/{src}", stream_dir / src)
        os.utime(stream_dir / src, (1e9 + i, 1e9 + i))
    # epoch 2: the same recordings resampled 2000->4000 (content
    # unchanged, rolloff collapses) under fresh clip_ids
    base = spark.read.parquet(f"{fixture_dir}/clips/part-0000.parquet")
    rs = (multimodal.audio_resample(base, target_rate=4000)
          .select("rid", F.col("bytes").alias("bytes"))
          .join(base.select("rid", "clip_id", "sr_hz", "dur_ms",
                            "transcript", "part"), "rid")
          .select("rid", F.concat(F.lit("rs-"), "clip_id").alias("clip_id"),
                  "bytes", "sr_hz", "dur_ms",
                  F.lit("pcm_s16le").alias("codec"), "transcript", "part"))
    rs_dir = tmp_path / "rs"
    rs.coalesce(1).write.parquet(str(rs_dir))
    rs_file = next(p for p in rs_dir.iterdir()
                   if p.name.endswith(".parquet"))
    shutil.copy(rs_file, stream_dir / "part-0002.parquet")
    os.utime(stream_dir / "part-0002.parquet", (1e9 + 2, 1e9 + 2))

    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    q = stream_validate.validate_stream_with_gate(
        spark, str(stream_dir), f"{fixture_dir}/allowed_codecs.parquet",
        out, ckpt, str(tmp_path / "g"), acoustic=True,
        max_files_per_trigger=1)
    assert q.awaitTermination(300)

    gates = spark.read.parquet(out + "_gates").collect()
    flagged = {(r.epoch, r.gate, r.subject) for r in gates if r.flagged}
    # clean epoch 1 vs clean epoch 0: acoustic columns quiet
    assert not any(s in ("rolloff_hz", "flatness_centi")
                   for e, _, s in flagged if e == 1)
    # resampled epoch 2: the rolloff collapse must trip an acoustic gate
    assert any(s == "rolloff_hz" and g in ("moments", "quantile")
               for e, g, s in flagged if e == 2), sorted(flagged)


def test_stream_gate_quarantine_diverts_before_commit(
        spark, fixture_dir, tmp_path):
    """With quarantine on, each epoch's rejected rows land in the
    _quarantined sink and ONLY admitted rows enter the gate table, so
    admitted + quarantined == ingested and the gate baselines never see
    rejected rows (the injected 192 kHz sr outlier is diverted, not
    committed)."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_validate)

    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    gate_root = str(tmp_path / "g")
    q = stream_validate.validate_stream_with_gate(
        spark, f"{fixture_dir}/clips",
        f"{fixture_dir}/allowed_codecs.parquet", out, ckpt, gate_root,
        quarantine=True)
    assert q.awaitTermination(300)

    io = ParquetTableIO(gate_root)
    committed = sum(s["rows"] for s in
                    io.snapshot_stats(stream_validate.GATE_TABLE))
    bad = spark.read.parquet(out + "_quarantined")
    n_bad = bad.count()
    total = spark.read.parquet(f"{fixture_dir}/clips").count()
    assert n_bad > 0 and committed + n_bad == total
    # diverted reasons match the fixture defect classes
    reasons = set()
    for r in bad.collect():
        reasons.update(r.reasons.split(","))
    assert "null_transcript" in reasons and "duplicate_clip_id" in reasons
    # the gate table now contains zero out-of-range sr rows
    mx = io.read_appended(spark, stream_validate.GATE_TABLE) \
        .agg({"sr_hz": "max"}).collect()[0][0]
    assert mx <= 48000


def test_contract_stream_matches_batch(spark, fixture_dir, clips, tmp_path):
    """Streaming contract enforcement: per-partition verdicts across all
    epochs equal the batch suggested-suite run (one file per partition,
    so no partition splits across micro-batches), and the streaming-unsafe
    ``unique`` constraint is dropped like the hand suite drops it."""
    from drift_detection_pibic___framework_spark.operators import (
        profile as PR)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_validate)

    contract = [
        ("transcript", "not_null", ""),
        ("sr_hz", "range", "[8000,48000]"),
        ("codec", "isin", "alaw,mulaw,pcm_s16le"),
        ("clip_id", "unique", ""),           # must be dropped in streaming
        ("transcript", "completeness_pct_ge", "99"),
    ]
    q = stream_validate.contract_stream(
        spark, f"{fixture_dir}/clips", contract,
        str(tmp_path / "out"), str(tmp_path / "ckpt"))
    assert q.awaitTermination(300)
    got = spark.read.parquet(str(tmp_path / "out"))

    g = {(r["part"], r["check_name"]): r["passed"] for r in got.collect()}
    assert not any(k[1].startswith("unique") for k in g)
    want = {(r["part"], r["check_name"]): r["passed"]
            for r in PR.suggested_suite_verdicts(
                clips, [c for c in contract if c[1] != "unique"]).collect()}
    assert g == want
    # the injected defects flag through the stream
    assert any(not p for (part, name), p in g.items()
               if name == "not_null(transcript)")
    assert any(not p for (part, name), p in g.items()
               if name == "isin(codec)")


def test_stream_gate_pinned_contract(spark, fixture_dir, tmp_path):
    """Fifth gate family: each epoch folds the ingested history's
    constraints from sidecars and diffs against a scan-path pin.  The
    baseline epoch (parts 0-3, carrying 192 kHz outliers) already widens
    the pinned sr_hz range; the opus epoch (parts 4-7) grows the codec
    domain; scan-only constraint families in the pin (sr_hz isin: no MG
    sidecar for sr_hz) are skipped, never reported removed."""
    from drift_detection_pibic___framework_spark.operators import (
        profile as P)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_validate)
    from pyspark.sql import functions as F

    clips = spark.read.parquet(f"{fixture_dir}/clips")
    clean = (clips.filter((F.col("part").isin(0, 1))
                          & (F.col("sr_hz") != 192000))
             .select("clip_id", "sr_hz", "dur_ms", "codec"))
    pinned = [(r.column, r.constraint, r.params) for r in
              P.suggest_constraints(
                  clean, cols=["clip_id", "sr_hz", "dur_ms", "codec"],
                  exact_distinct=True).collect()]
    assert ("sr_hz", "isin") in {(c, k) for c, k, _ in pinned}

    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    q = stream_validate.validate_stream_with_gate(
        spark, f"{fixture_dir}/clips",
        f"{fixture_dir}/allowed_codecs.parquet", out, ckpt,
        str(tmp_path / "g"), pinned_contract=pinned)
    assert q.awaitTermination(300)

    rows = [r for r in spark.read.parquet(out + "_gates").collect()
            if r.gate == "contract"]
    assert rows, "contract gate emitted no rows"
    flagged = {(r.epoch, r.subject) for r in rows if r.flagged}
    # epoch 0 ingests parts 2-3's 192 kHz outliers -> range widens at once
    assert (0, "sr_hz.range") in flagged
    # epoch 1 ingests part 5's opus -> domain grows from then on
    assert (1, "codec.isin") in flagged
    assert (2, "codec.isin") in flagged
    # the scan-only sr_hz isin pin is unobservable from sidecars: skipped
    assert not any(s == "sr_hz.isin" for _, s in flagged)
    assert not any(r.subject == "sr_hz.isin" for r in rows)
    # dur_ms range: the pin came from parts 0/1 only, so later parts'
    # longer/shorter durations widen it -> flagged at every epoch
    assert any(s == "dur_ms.range" for _, s in flagged)
