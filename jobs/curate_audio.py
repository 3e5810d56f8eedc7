"""Audio curation job — ``spark-submit jobs/curate_audio.py [options]``.

The AUDIO counterpart of jobs/curate.py (which curates the text corpus):
takes the clips table and produces the standardized training-audio table
the way a speech-pretraining pipeline does —

  1. quarantine       row-level admit/divert over the validation suite's
                      predicates (null transcript, sr range, unknown
                      codec, duplicate clip_id) — operators/quarantine.py
  2. quality screen   drop clips that are mostly silence, digitally
                      clipped, or mastered below a loudness floor
                      (operators/multimodal.py audio_quality)
  2b. label conflicts optional: drop BOTH members of every near-identical
                      audio pair whose transcripts disagree (one label is
                      wrong and we cannot adjudicate which — the standard
                      ASR-corpus conservative policy).  Runs BEFORE
                      payload dedup: dedup would collapse the pair and
                      silently keep one possibly-wrong label.
                      --wer-threshold W relaxes the blanket drop into
                      adjudication: conflicts at word-error-rate <= W are
                      transcription noise (keep; payload dedup collapses
                      them), only WER > W pairs drop both members
  2c. audio dedup     optional: drop near-duplicate PAYLOADS (envelope-
                      fingerprint Hamming pairs closed into groups, keep
                      the min-clip_id representative) — the re-upload case
                      id-dedup cannot see.  Both 2b and 2c share ONE
                      fingerprint pass (the decode is paid once)
  3. standardize      fused trim -> resample -> loudness-gain kernel:
                      ONE decode and ONE encode per clip
                      (multimodal.audio_standardize)
  4. write            curated clips (pcm_s16le at the target rate, target
                      loudness, edge silence removed) + metadata re-joined

Stage row counts are printed so attrition is attributable; the final
write re-joins transcript metadata by rid (an equi-join on the scan key —
co-partitioned at scale, broadcast-sized here).

The reference drops offending rows before processing and re-scales
features to its baseline window (/root/reference/framework.py
MudancaDeConceito.normalizar — SURVEY §2.2 P3/P9); this job is the
payload-side analog: the rows that survive validation are normalized to
one rate and one loudness before entering a training mix.

Usage:
    spark-submit jobs/curate_audio.py --data data/sf0.001 \
        [--out /tmp/curated_audio] [--target-rate 1000] \
        [--target-dbfs -20] [--max-silence 0.9] [--max-clip 0.1] \
        [--min-dbfs -60] [--master local[8]]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/sf0.001",
                    help="fixture dir with clips/ + allowed_codecs.parquet")
    ap.add_argument("--out", default=None,
                    help="write curated clips parquet here")
    ap.add_argument("--target-rate", type=int, default=1000)
    ap.add_argument("--target-dbfs", type=float, default=-20.0)
    ap.add_argument("--max-silence", type=float, default=0.9,
                    help="drop clips with silence_ratio >= this")
    ap.add_argument("--max-clip", type=float, default=0.1,
                    help="drop clips with clip_ratio >= this")
    ap.add_argument("--min-dbfs", type=float, default=-60.0,
                    help="drop clips with rms_dbfs < this")
    ap.add_argument("--dedup-audio", type=int, default=-1, metavar="H",
                    help="drop near-duplicate payloads within Hamming "
                         "radius H over the 64-bit envelope fingerprint, "
                         "keeping each group's min clip_id (-1 = off; "
                         "0 = exact payload dups only)")
    ap.add_argument("--drop-label-conflicts", action="store_true",
                    help="drop both members of near-identical audio "
                         "pairs (Hamming <= 2) with disagreeing "
                         "transcripts")
    ap.add_argument("--wer-threshold", type=float, default=None,
                    metavar="W",
                    help="adjudicate label conflicts instead of blanket-"
                         "dropping: pairs whose word error rate is <= W "
                         "are minor transcription noise — BOTH members "
                         "are kept (payload dedup collapses them to the "
                         "min-clip_id copy); only pairs with WER > W "
                         "are genuinely conflicting labels and drop "
                         "both.  Requires --drop-label-conflicts")
    ap.add_argument("--band-features", action="store_true",
                    help="annotate curated rows with band-energy "
                         "fractions + spectral flatness (computed on the "
                         "pre-standardize payload), so downstream "
                         "commit-gate sidecars can drift-gate ACOUSTIC "
                         "columns the same way they gate metadata")
    ap.add_argument("--master",
                    default=os.environ.get("SPARK_MASTER", "local[8]"))
    ap.add_argument("--shuffle-partitions", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from drift_detection_pibic___framework_spark.operators import (
        multimodal, quarantine)

    clips_path = os.path.join(args.data, "clips")
    dim_path = os.path.join(args.data, "allowed_codecs.parquet")
    if not os.path.isdir(clips_path):
        print(f"error: {clips_path} not found", file=sys.stderr)
        return 2
    if args.wer_threshold is not None and not args.drop_label_conflicts:
        print("error: --wer-threshold requires --drop-label-conflicts",
              file=sys.stderr)
        return 2

    t0 = time.time()
    spark = (SparkSession.builder.master(args.master)
             .appName("dpf-curate-audio")
             .config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    clips = spark.read.parquet(clips_path)
    dim = spark.read.parquet(dim_path)
    n_in = clips.count()

    # 1. quarantine: the validation suite's row predicates
    clean, bad = quarantine.quarantine(clips, dim)
    n_clean = clean.count()

    # 2. quality screen over the admitted rows (silence / clipping /
    # loudness floor); bytes is read once here and once in standardize —
    # both are full-payload passes by necessity
    q = multimodal.audio_quality(clean).select(
        "rid", "silence_ratio", "clip_ratio", "rms_dbfs")
    keep_ids = q.filter(
        (F.col("silence_ratio") < args.max_silence)
        & (F.col("clip_ratio") < args.max_clip)
        & (F.col("rms_dbfs") >= args.min_dbfs)).select("rid")
    screened = clean.join(keep_ids, "rid")
    n_screen = screened.count()

    # ONE fingerprint pass (a full decode scan) feeds both 2b and 2c:
    # pairs are generated at the larger of the two radii (the pigeonhole
    # chunk count is radius-derived, so the wider join covers both) and
    # filtered per stage
    pairs = None
    if args.drop_label_conflicts or args.dedup_audio >= 0:
        radius = max(args.dedup_audio if args.dedup_audio >= 0 else 0,
                     2 if args.drop_label_conflicts else 0)
        pairs = multimodal.audio_near_duplicates(
            screened, max_hamming=radius,
            fingerprints=multimodal.audio_fingerprint(screened)).persist()

    # 2b. label-noise adjudication FIRST: near-identical audio with
    # disagreeing transcripts — drop BOTH members (cannot know which
    # label is right).  Must precede payload dedup, which would collapse
    # the pair and silently keep one possibly-wrong label.
    n_label = n_screen
    if args.drop_label_conflicts:
        conf = multimodal.transcript_conflicts(
            screened, max_hamming=2, pairs=pairs)
        if args.wer_threshold is not None:
            # adjudicate: WER <= threshold is transcription noise, not a
            # conflicting label — keep the pair and let payload dedup
            # collapse it.  The Arrow kernel (no vocabulary cap) scores
            # only the conflict pairs (tiny vs the corpus).  The drop
            # decision uses the ORIENTATION-INVARIANT denominator
            # max(tokens_a, tokens_b): neither member of a label-conflict
            # pair is a reference, and tok_dist/n_tokens_a would let the
            # verdict flip with which clip drew the smaller id on
            # length-asymmetric transcripts (ADVICE r4).
            from drift_detection_pibic___framework_spark.operators.text \
                import _edit_norm, edit_metrics_kernel
            tr = screened.select("clip_id", "transcript")
            scored = (conf
                      .join(tr.select(F.col("clip_id").alias("clip_a"),
                                      F.col("transcript").alias("t_a")),
                            "clip_a")
                      .join(tr.select(F.col("clip_id").alias("clip_b"),
                                      F.col("transcript").alias("t_b")),
                            "clip_b"))

            def _ntok(c):
                n = _edit_norm(F.col(c))
                return F.when(n == "", 0).otherwise(
                    F.size(F.split(n, " ")))

            # NULL wer_sym = the kernel's banded give-up (distance proven
            # > max_dist): maximal disagreement, so it must DROP the pair
            # like any over-threshold score — a bare `>` comparison would
            # silently keep it (NULL fails every filter)
            conf = (edit_metrics_kernel(scored, "t_a", "t_b")
                    .withColumn("wer_sym", F.col("tok_dist") /
                                F.greatest(_ntok("t_a"), _ntok("t_b"),
                                           F.lit(1)))
                    .filter(F.col("wer_sym").isNull() |
                            (F.col("wer_sym") > args.wer_threshold)))
        bad_ids = (conf.select(F.col("clip_a").alias("clip_id"))
                   .unionByName(conf.select(F.col("clip_b")
                                            .alias("clip_id")))
                   .distinct())
        screened = screened.join(bad_ids, "clip_id", "left_anti")
        n_label = screened.count()

    # 2c. audio-payload dedup over the label-clean survivors: Hamming
    # pairs -> group closure -> keep the min-clip_id representative
    # (quarantine already diverted duplicate clip_ids, so ids are unique
    # here).  Pairs are semi-restricted to survivors so a clip whose
    # only twin was conflict-dropped is not itself deleted as a "dup".
    n_dedup = n_label
    if args.dedup_audio >= 0:
        from drift_detection_pibic___framework_spark.operators.dedup import (
            connected_components)
        ids = screened.select("clip_id")
        p = (pairs.filter(F.col("hamming") <= args.dedup_audio)
             .join(ids.withColumnRenamed("clip_id", "clip_a"), "clip_a",
                   "left_semi")
             .join(ids.withColumnRenamed("clip_id", "clip_b"), "clip_b",
                   "left_semi"))
        comp = connected_components(p, src="clip_a", dst="clip_b")
        drop = (comp.filter(F.col("node") != F.col("component"))
                .select(F.col("node").alias("clip_id")))
        screened = screened.join(drop, "clip_id", "left_anti")
        n_dedup = screened.count()
    if pairs is not None:
        pairs.unpersist()

    # 3. fused standardize (one decode + one encode per clip)
    std = multimodal.audio_standardize(
        screened, args.target_rate, args.target_dbfs)

    # 4. re-join transcript metadata and write
    meta = screened.select("rid", "transcript")
    band_cols = []
    if args.band_features:
        bf = multimodal.audio_band_energy(screened).drop("clip_id", "part")
        meta = meta.join(bf, "rid")
        band_cols = [c for c in bf.columns if c != "rid"]
    curated = (std.join(meta, "rid")
               .select("clip_id", "part", *band_cols,
                       F.col("bytes"),
                       F.lit(args.target_rate).alias("sr_hz"),
                       F.round(F.col("n_out") * 1000.0 / args.target_rate)
                       .cast("int").alias("dur_ms"),
                       F.lit("pcm_s16le").alias("codec"),
                       "transcript", "gain_db", "limited",
                       "lead_trim_ms", "trail_trim_ms"))

    summary = std.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("gain_db"), 3).alias("gain_db_mean"),
        F.sum(F.col("limited").cast("bigint")).alias("n_limited"),
        F.round(F.sum(F.col("lead_trim_ms") + F.col("trail_trim_ms"))
                / 1000.0, 3).alias("trimmed_s"),
        F.sum(F.col("n_out").cast("bigint")).alias("samples_out"),
    ).collect()[0]

    if args.out:
        curated.write.mode("overwrite").parquet(args.out)
        n_final = spark.read.parquet(args.out).count()
    else:
        n_final = curated.count()

    dt = time.time() - t0
    extra = ""
    if args.drop_label_conflicts:
        extra += f" label-clean={n_label}"
    if args.dedup_audio >= 0:
        extra += f" payload-deduped={n_dedup}"
    print(f"curate_audio: in={n_in} admitted={n_clean} "
          f"screened={n_screen}{extra} curated={n_final}")
    print(f"standardized: rate={args.target_rate}Hz "
          f"loudness={args.target_dbfs}dBFS "
          f"gain_mean={summary['gain_db_mean']}dB "
          f"limited={summary['n_limited']} "
          f"trimmed={summary['trimmed_s']}s "
          f"samples_out={summary['samples_out']}")
    print(f"done in {dt:.1f}s ({n_in / dt:.0f} clips/sec)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
