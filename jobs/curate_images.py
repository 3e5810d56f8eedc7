"""Image curation job — ``spark-submit jobs/curate_images.py [options]``.

The IMAGE counterpart of jobs/curate_audio.py, over the round-5 real
decoders (operators/images.py: PPM/PGM/BMP in pure numpy).  Takes a table
of (img_id, bytes, fmt) rows and produces the curated thumbnail table a
vision-pretraining pipeline ships —

  1. decode gate     one feature pass (mapInPandas) computes shape/luma
                     stats + the 64-bit dHash; rows that fail to decode
                     (truncated payload, compressed format with no codec
                     here) are DIVERTED with decode_ok=false, never
                     silently dropped
  2. near-dup drop   dHash Hamming pairs (chunk-pigeonhole equi-join,
                     never all-pairs) -> connected-component closure ->
                     keep each group's min img_id — the re-upload /
                     re-crop case exact byte-dedup cannot see
  3. thumbnails      decode -> exact area-resize -> re-encode PGM:
                     output payload is O(size^2) per row regardless of
                     input size
  4. write           curated rows (features + thumb) re-joined by img_id

Stage counts are printed so attrition is attributable.  Input comes from
``--images DIR`` (parquet with img_id/bytes/fmt) or ``--synth N`` — a
DISTRIBUTED deterministic generator (each row derives from its id, so any
N is reproducible with no driver-side materialization; a fraction of
near-duplicate twins and broken payloads is injected to exercise stages
1-2).  No external data is read in either mode.

Usage:
    spark-submit jobs/curate_images.py --synth 2000 \
        [--out /tmp/curated_images] [--thumb-size 8] [--dedup-hamming 6] \
        [--master local[8]]
    spark-submit jobs/curate_images.py --images /path/to/images_parquet
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_images(spark, n: int):
    """Deterministic distributed image table — shared with the rows-only
    driver queries; see operators/images.py synth_images for the
    injection schedule."""
    from drift_detection_pibic___framework_spark.operators import images as I
    return I.synth_images(spark, n)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None,
                    help="parquet dir with (img_id, bytes, fmt)")
    ap.add_argument("--synth", type=int, default=None, metavar="N",
                    help="synthesize N deterministic images instead")
    ap.add_argument("--out", default=None,
                    help="write curated rows (features + thumb) here")
    ap.add_argument("--thumb-size", type=int, default=8)
    ap.add_argument("--dedup-hamming", type=int, default=6, metavar="H",
                    help="near-dup radius over the 64-bit dHash "
                         "(-1 disables the dedup stage)")
    ap.add_argument("--master",
                    default=os.environ.get("SPARK_MASTER", "local[8]"))
    ap.add_argument("--shuffle-partitions", type=int, default=16)
    args = ap.parse_args()

    if (args.images is None) == (args.synth is None):
        print("error: exactly one of --images/--synth", file=sys.stderr)
        return 2
    if args.images and not os.path.isdir(args.images):
        print(f"error: {args.images} not found", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession, functions as F

    from drift_detection_pibic___framework_spark.operators import (
        images as I)
    from drift_detection_pibic___framework_spark.operators.dedup import (
        connected_components)

    t0 = time.time()
    spark = (SparkSession.builder.master(args.master)
             .appName("curate_images")
             .config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
             .getOrCreate())
    # NOTE: no spark.stop() — getOrCreate() may have joined a caller's
    # session (the in-process test harness does exactly this; same
    # convention as jobs/curate_audio.py)
    spark.sparkContext.setLogLevel("WARN")
    imgs = (spark.read.parquet(args.images) if args.images
            else synth_images(spark, args.synth))
    n_in = imgs.count()

    # 1. ONE feature/decode pass feeds the gate AND the dedup stage
    feats = I.image_features(imgs).persist()
    good = feats.filter(F.col("decode_ok"))
    n_good = good.count()
    n_diverted = n_in - n_good

    # 2. near-dup drop: pairs -> closure -> keep min-id representative
    n_dedup = n_good
    survivors = good
    if args.dedup_hamming >= 0:
        pairs = I.image_near_duplicates(
            imgs, max_hamming=args.dedup_hamming, features=feats)
        comp = connected_components(pairs, src="img_a", dst="img_b")
        drop = (comp.filter(F.col("node") != F.col("component"))
                .select(F.col("node").alias("img_id")))
        survivors = good.join(drop, "img_id", "left_anti")
        n_dedup = survivors.count()

    # 3+4. thumbnails for survivors only (semi-join pushes the cut
    # into the decode pass), re-join features, write
    kept_ids = survivors.select("img_id")
    thumbs = I.image_thumbnails(
        imgs.join(kept_ids, "img_id", "left_semi"),
        size=args.thumb_size)
    curated = survivors.drop("decode_ok").join(thumbs, "img_id")

    if args.out:
        curated.write.mode("overwrite").parquet(args.out)
        n_final = spark.read.parquet(args.out).count()
    else:
        n_final = curated.count()
    feats.unpersist()

    dt = time.time() - t0
    print(f"curate_images: in={n_in} decoded={n_good} "
          f"diverted={n_diverted} deduped={n_dedup} "
          f"curated={n_final}")
    print(f"done in {dt:.1f}s ({n_in / dt:.0f} images/sec)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
