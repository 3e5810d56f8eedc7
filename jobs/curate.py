"""Training-data curation job — ``spark-submit jobs/curate.py [options]``.

The pipeline counterpart to jobs/validate.py: takes a documents table and
produces a curated corpus the way a web-scale pretraining run does —

  0. markup strip     (optional: tag/entity removal before any screen —
                       quality scored on raw HTML measures the markup)
  1. quality filter   (length / alpha-ratio / mean-word-length score)
  1b. LM perplexity   (optional: self-trained bigram LM, drop docs with
                       ppl above a cut — the CCNet-style filter)
  1c. line dedup      (optional: strip lines occurring >= N times
                       corpus-wide — C4's boilerplate removal, run BEFORE
                       doc dedup so near-dup detection keys on content,
                       not shared banners)
  2. deduplication    (exact md5 keep-min, then MinHash+LSH near-dup
                       closure via connected components, keep-one-per-group)
  2b. span strip      (optional: remove duplicated >=L-token passages
                       surviving doc-level dedup — boilerplate headers,
                       licenses, templates; Lee et al. 2022 span dedup)
  3. decontamination  (optional: drop docs sharing any 13-gram with a
                       held-out eval/benchmark table)
  4. PII scrub        (optional: mask email/phone/SSN/IPv4, report hits)
  5. per-source quota (row_number cap — one crawler trap can't dominate)
  6. hash sample      (optional deterministic md5-threshold ablation slice)
  7. temperature mix  (optional √n-smoothed source mixture to ~N docs)
  7b. weighted sample (optional quality-weighted top-K draw — E-S A-Res,
                       deterministic, inclusion ∝ quality score)
  8. length buckets   (optional token-length quartile annotation)
  9. sequence packing (optional GPT-style pack-and-split seq/offset ids)

Every stage is a narrow filter or a key-partitioned shuffle (see
operators/dedup.py, operators/sampling.py docstrings for the 100 TB
shapes); stage row counts are printed so attrition is attributable.

Usage:
    spark-submit jobs/curate.py --data /root/testdata/sf0.001 \
        [--out /tmp/curated] [--min-quality 0.5] [--jaccard 0.7] \
        [--cap-per-source N] [--sample-256 N] [--master local[8]]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/testdata/sf0.001",
                    help="directory containing documents.parquet")
    ap.add_argument("--out", default=None,
                    help="write the curated corpus here (parquet)")
    ap.add_argument("--strip-markup", action="store_true",
                    help="strip HTML tags/entities from text before any "
                         "screen (extraction step)")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--max-ppl", type=float, default=0.0,
                    help="drop docs whose self-trained bigram-LM "
                         "perplexity exceeds this (0 = no LM filter)")
    ap.add_argument("--jaccard", type=float, default=0.7,
                    help="near-dup threshold for the LSH phase")
    ap.add_argument("--strip-lines", type=int, default=0, metavar="N",
                    help="strip lines occurring >= N times corpus-wide "
                         "(C4 boilerplate removal; 0 = off, 3 = the C4 "
                         "setting)")
    ap.add_argument("--strip-spans", type=int, default=0, metavar="L",
                    help="strip duplicated passages of >= L tokens that "
                         "survive doc-level dedup (0 = off; 8 is a "
                         "typical gram length)")
    ap.add_argument("--decontaminate", default=None, metavar="EVAL_PARQUET",
                    help="parquet of held-out eval docs (doc_id, text); "
                         "drop corpus docs sharing any n-gram with them")
    ap.add_argument("--decon-ngram", type=int, default=13)
    ap.add_argument("--pii-scrub", action="store_true",
                    help="mask email/phone/SSN/IPv4 in the output text")
    ap.add_argument("--cap-per-source", type=int, default=0,
                    help="max docs per source (0 = no cap)")
    ap.add_argument("--target-file-mb", type=int, default=128,
                    help="compact the output to ~this file size "
                         "(0 = leave the shuffle's file count)")
    ap.add_argument("--sample-256", type=int, default=0,
                    help="keep ~N/256 of the corpus, md5-deterministic "
                         "(0 = no sampling)")
    ap.add_argument("--temperature-mix", type=int, default=0, metavar="N",
                    help="temperature-smooth the source mixture to ~N "
                         "docs (p ∝ √n per source; 0 = no mixing)")
    ap.add_argument("--weighted-sample", type=int, default=0, metavar="K",
                    help="keep exactly K docs drawn with probability "
                         "proportional to quality score (deterministic "
                         "Efraimidis-Spirakis; 0 = off)")
    ap.add_argument("--length-buckets", action="store_true",
                    help="annotate output docs with a token-length "
                         "quartile bucket (padding-efficient batching)")
    ap.add_argument("--pack-seq-len", type=int, default=0, metavar="B",
                    help="assign GPT-style pack-and-split sequence ids "
                         "with B tokens per sequence (0 = no packing)")
    ap.add_argument("--admit-stream", default=None, metavar="INDEX_ROOT",
                    help="streaming ingest admission against the persisted "
                         "DedupIndex at INDEX_ROOT: drain --feed (parquet "
                         "files of doc_id,text) through the exactly-once "
                         "gate (streaming/stream_admit.py) into --out, "
                         "resumable from --checkpoint; near-dup threshold "
                         "= --jaccard.  Exclusive mode: no other curation "
                         "stage runs")
    ap.add_argument("--feed", default=None, metavar="DIR",
                    help="document feed directory for --admit-stream")
    ap.add_argument("--checkpoint", default=None, metavar="DIR",
                    help="streaming checkpoint for --admit-stream")
    ap.add_argument("--master",
                    default=os.environ.get("SPARK_MASTER", "local[8]"))
    ap.add_argument("--shuffle-partitions", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from drift_detection_pibic___framework_spark.operators import (
        dedup, sampling, text)

    if args.admit_stream:
        if not (args.feed and args.out and args.checkpoint):
            print("error: --admit-stream needs --feed, --out and "
                  "--checkpoint", file=sys.stderr)
            return 2
    else:
        doc_path = os.path.join(args.data, "documents.parquet")
        if not os.path.exists(doc_path):
            print(f"error: {doc_path} not found", file=sys.stderr)
            return 2

    t0 = time.time()
    spark = (SparkSession.builder.master(args.master)
             .appName("dpf-curate")
             .config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    if args.admit_stream:
        from drift_detection_pibic___framework_spark.sources.tableio \
            import ParquetTableIO
        from drift_detection_pibic___framework_spark.streaming.stream_admit \
            import ADMIT_SCOPE, ADMITTED_TABLE, admission_stream
        q = admission_stream(spark, args.feed, "doc_id long, text string",
                             args.out, args.checkpoint, args.admit_stream,
                             threshold=args.jaccard)
        q.awaitTermination()
        io = ParquetTableIO(args.admit_stream)
        epochs = sorted(io.read_manifest(ADMIT_SCOPE))
        n_total = io.read_appended(spark, ADMITTED_TABLE).count()
        dt = time.time() - t0
        print(f"admitted stream drained: {len(epochs)} epochs committed "
              f"(ids {epochs[:8]}{'...' if len(epochs) > 8 else ''}), "
              f"index now covers {n_total} docs, in {dt:.1f}s")
        return 0

    docs = spark.read.parquet(doc_path)
    n_in = docs.count()

    n_markup_docs = 0
    if args.strip_markup:
        from pyspark.sql import functions as F
        s = text.strip_markup(docs)
        n_markup_docs = s.filter("n_tags > 0").count()
        docs = (docs.drop("text")
                .join(s.select("doc_id",
                               F.col("stripped_text").alias("text")),
                      "doc_id"))

    scored = text.with_quality(docs).select("doc_id", "quality_score")
    kept = (docs.join(
        scored.filter(scored.quality_score >= args.min_quality)
        .select("doc_id"), "doc_id"))
    n_quality = kept.count()

    n_lm = n_quality
    if args.max_ppl:
        # CCNet-style: the quality-kept slice is the (self-)trusted
        # training corpus; high-ppl outliers against it are dropped
        model = text.train_bigram_lm(kept)
        lm = text.lm_score(kept, model)
        kept = kept.join(
            lm.filter(lm.ppl <= args.max_ppl).select("doc_id"), "doc_id")
        n_lm = kept.count()

    n_line_docs = 0
    if args.strip_lines:
        from pyspark.sql import functions as F
        s = dedup.strip_frequent_lines(kept, min_count=args.strip_lines)
        n_line_docs = s.filter("n_lines_removed > 0").count()
        kept = (s.withColumn("text", F.col("text_clean"))
                .drop("text_clean", "n_lines_removed"))

    deduped = dedup.dedup_corpus(kept, jaccard_threshold=args.jaccard)
    n_dedup = deduped.count()

    n_span_docs = 0
    if args.strip_spans:
        from pyspark.sql import functions as F
        s = dedup.strip_duplicate_spans(deduped, L=args.strip_spans)
        n_span_docs = s.filter("n_tokens_removed > 0").count()
        # output text keeps the original tokens' casing/spelling; only
        # whitespace runs (incl. newlines) collapse to single spaces
        # (span offsets index whitespace tokens, so the raw and
        # normalized token streams align 1:1)
        deduped = (s.withColumn("text", F.col("text_clean"))
                   .drop("text_clean", "n_tokens_removed"))

    n_decon = n_dedup
    if args.decontaminate:
        from pyspark.sql import functions as F
        ev = (spark.read.parquet(args.decontaminate)
              .select(F.col("doc_id").alias("eval_id"), "text"))
        deduped = dedup.decontaminate(deduped, ev, n=args.decon_ngram)
        n_decon = deduped.count()

    n_pii_docs = 0
    if args.pii_scrub:
        from pyspark.sql import functions as F
        s = text.pii_scrub(deduped)
        n_pii_docs = s.filter("n_pii > 0").count()
        deduped = (s.withColumn("text", F.col("masked_text"))
                   .drop("masked_text", "n_pii",
                         *[f"n_{k}" for k in text.PII_PATTERNS]))

    if args.cap_per_source:
        deduped = sampling.group_cap(
            deduped, "source", args.cap_per_source, "doc_id")
        n_capped = deduped.count()
    else:
        n_capped = n_decon

    if args.sample_256:
        deduped = sampling.hash_sample(deduped, "doc_id", args.sample_256)
        n_sampled = deduped.count()
    else:
        n_sampled = n_capped

    if args.temperature_mix:
        deduped = sampling.temperature_mix(
            deduped, "source", "doc_id", args.temperature_mix)
        n_mixed = deduped.count()
    else:
        n_mixed = n_sampled

    n_weighted = n_mixed
    if args.weighted_sample:
        from pyspark.sql import functions as F
        # weight = the same composite quality score stage 1 screened on
        # (recomputed on the post-strip text, floored so every surviving
        # doc keeps a nonzero draw chance)
        w = (text.with_quality(deduped)
             .select("doc_id",
                     F.greatest(F.col("quality_score"), F.lit(0.01))
                     .alias("_w")))
        deduped = (sampling.weighted_sample(
            deduped.join(w, "doc_id"), "_w", args.weighted_sample)
            .drop("_w", "es_key"))
        n_weighted = deduped.count()

    bucket_counts = None
    if args.length_buckets:
        from pyspark.sql import functions as F
        b = text.length_buckets(deduped).select("doc_id", "n_tokens",
                                                "bucket")
        deduped = deduped.join(b, "doc_id")
        bucket_counts = sorted(
            (r.bucket, r.c) for r in deduped.groupBy("bucket")
            .agg(F.count("*").alias("c")).collect())

    n_seqs = 0
    if args.pack_seq_len:
        from drift_detection_pibic___framework_spark.operators import packing
        from pyspark.sql import functions as F
        if "n_tokens" not in deduped.columns:
            deduped = deduped.join(
                text.with_token_counts(deduped)
                .select("doc_id", "n_tokens"), "doc_id")
        deduped = packing.pack_sequences(deduped, args.pack_seq_len)
        n_seqs = (deduped.agg(F.max("seq_id")).collect()[0][0] or 0) + 1

    if args.out:
        deduped.write.mode("overwrite").parquet(args.out)
        if args.target_file_mb:
            # the curated corpus is read many times downstream (training
            # shards); size its files once at write time
            from drift_detection_pibic___framework_spark.sources.tableio import (
                compact_parquet_dir)
            c = compact_parquet_dir(
                spark, args.out,
                target_file_bytes=args.target_file_mb * 1024 * 1024)
            print(f"compacted {c['files_before']} -> {c['files_after']} files")

    dt = time.time() - t0
    print(f"input             {n_in:>10d}")
    if args.strip_markup:
        print(f"markup-stripped   {n_markup_docs:>10d}  (docs with tags)")
    print(f"quality >= {args.min_quality:<6g} {n_quality:>10d}  "
          f"(-{n_in - n_quality})")
    if args.max_ppl:
        print(f"ppl <= {args.max_ppl:<9g} {n_lm:>10d}  "
              f"(-{n_quality - n_lm})")
    if args.strip_lines:
        print(f"line-stripped     {n_line_docs:>10d}  "
              f"(docs losing >= 1 boilerplate line)")
    print(f"deduped           {n_dedup:>10d}  (-{n_lm - n_dedup})")
    if args.strip_spans:
        print(f"span-stripped     {n_span_docs:>10d}  "
              f"(docs losing >= 1 duplicated passage)")
    if args.decontaminate:
        print(f"decontaminated    {n_decon:>10d}  (-{n_dedup - n_decon})")
    if args.pii_scrub:
        print(f"pii-scrubbed docs {n_pii_docs:>10d}  (masked in output)")
    if args.cap_per_source:
        print(f"source cap {args.cap_per_source:<6d} {n_capped:>10d}  "
              f"(-{n_dedup - n_capped})")
    if args.sample_256:
        print(f"sample {args.sample_256}/256     {n_sampled:>10d}")
    if args.temperature_mix:
        print(f"temp-mixed ~{args.temperature_mix:<6d} {n_mixed:>10d}  "
              f"(-{n_sampled - n_mixed})")
    if args.weighted_sample:
        print(f"quality-weighted  {n_weighted:>10d}  "
              f"(top-{args.weighted_sample} A-Res draw)")
    if bucket_counts is not None:
        print("length buckets    "
              + "  ".join(f"b{b}={c}" for b, c in bucket_counts))
    if args.pack_seq_len:
        print(f"packed            {n_seqs:>10d} sequences "
              f"x {args.pack_seq_len} tokens")
    print(f"\ncurated {n_weighted}/{n_in} docs in {dt:.1f}s"
          + (f" -> {args.out}" if args.out else ""))
    # no spark.stop(): under spark-submit the JVM teardown handles it, and
    # getOrCreate may have returned a session the caller (e.g. the pytest
    # fixture) still owns — every other job here follows the same rule
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
