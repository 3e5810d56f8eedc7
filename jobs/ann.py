"""Persisted ANN index job — the operational surface for
``operators/similarity.AnnIndex`` (the embedding twin of the DedupIndex
admission mode in ``jobs/curate.py --admit-stream``).

The index lives under a TableIO root: a range-clustered ``ann_cells``
inverted file plus an O(centroids x dim) state sidecar holding the fitted
quantizer.  Build once over the corpus; each later ingestion ``--admit``s
its increment in O(increment) (the quantizer is never refit, so cell ids
stay stable); ``--search`` probes only the probed cells' parquet files.

    spark-submit jobs/ann.py --root R --build corpus_emb.parquet \
        [--n-centroids 16] [--sample-rows 10000] [--n-files 16] \
        [--pq [--pq-m 8 --pq-k 16]]
    spark-submit jobs/ann.py --root R --admit new_emb.parquet
    spark-submit jobs/ann.py --root R --search queries.parquet \
        [--k 5] [--n-probe 4] [--mode exact|adc|refine] \
        [--shortlist 50] [--out DIR]
    spark-submit jobs/ann.py --root R --rollback '{"cells": N}'
    spark-submit jobs/ann.py --root R --compact
    spark-submit jobs/ann.py --root R --describe
    spark-submit jobs/ann.py --root R --stream-admit FEED_DIR \
        --checkpoint CKPT [--admitted-out DIR]

``--pq`` additionally fits per-subspace product-quantization codebooks
(``operators/pq.py``) and stores every row's m-int code in the inverted
file: ``--mode adc`` then searches codes only (the embedding column is
never read) and ``--mode refine`` exact-re-ranks the ADC shortlist.

``--build`` / ``--admit`` print the commit token as one JSON line — keep
it; ``--rollback`` with that token unwinds every commit made after it.
Exit 0 on success, 2 on bad arguments/paths/unbuilt index.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="TableIO root directory holding the index")
    ap.add_argument("--build", default=None, metavar="EMB_PARQUET",
                    help="fit the quantizer on EMB_PARQUET and index it")
    ap.add_argument("--admit", default=None, metavar="EMB_PARQUET",
                    help="append an increment to the built index")
    ap.add_argument("--search", default=None, metavar="Q_PARQUET",
                    help="probed top-k for each query vector")
    ap.add_argument("--rollback", default=None, metavar="TOKEN_JSON",
                    help="unwind commits made after this token")
    ap.add_argument("--describe", action="store_true",
                    help="print the index health report (metadata only)")
    ap.add_argument("--compact", action="store_true",
                    help="fold all admit commits into one re-clustered "
                         "rewrite (restores probe pruning; retires old "
                         "rollback tokens)")
    ap.add_argument("--stream-admit", default=None, metavar="FEED_DIR",
                    help="continuously admit embedding parquet files "
                         "landing in FEED_DIR through the exactly-once "
                         "gate (streaming/stream_ann_admit.py); requires "
                         "a built root and --checkpoint")
    ap.add_argument("--checkpoint", default=None,
                    help="with --stream-admit: checkpoint location")
    ap.add_argument("--admitted-out", default=None,
                    help="with --stream-admit: per-epoch inspection sink "
                         "(defaults to ROOT/admitted_epochs)")
    ap.add_argument("--feed-schema", default=None, metavar="DDL",
                    help="with --stream-admit: the feed's schema as a "
                         "DDL string (default '<id-col> bigint, "
                         "<vec-col> array<float>') — override when the "
                         "index was built over string ids or double "
                         "vectors")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--n-centroids", type=int, default=16)
    ap.add_argument("--sample-rows", type=int, default=10000)
    ap.add_argument("--n-files", type=int, default=16,
                    help="files per commit (range-clustered on ivf_cell)")
    ap.add_argument("--pq", action="store_true",
                    help="with --build: fit PQ codebooks and store codes")
    ap.add_argument("--pq-m", type=int, default=8,
                    help="PQ subspaces (must divide the embedding dim)")
    ap.add_argument("--pq-k", type=int, default=16,
                    help="codewords per subspace")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-probe", type=int, default=4)
    ap.add_argument("--mode", default="exact",
                    choices=["exact", "adc", "refine"],
                    help="with --search: exact cosine, codes-only ADC, "
                         "or ADC shortlist + exact re-rank")
    ap.add_argument("--shortlist", type=int, default=50,
                    help="with --mode refine: ADC candidates per query")
    ap.add_argument("--out", default=None,
                    help="with --search: write results parquet here "
                         "instead of printing the head")
    ap.add_argument("--master",
                    default=os.environ.get("SPARK_MASTER", "local[8]"))
    args = ap.parse_args()

    modes = [bool(args.build), bool(args.admit), bool(args.search),
             bool(args.rollback), args.describe, args.compact,
             bool(args.stream_admit)]
    if sum(modes) != 1:
        print("error: exactly one of --build/--admit/--search/--rollback/"
              "--describe/--compact/--stream-admit", file=sys.stderr)
        return 2
    if args.stream_admit and not args.checkpoint:
        print("error: --stream-admit requires --checkpoint",
              file=sys.stderr)
        return 2
    for p in (args.build, args.admit, args.search):
        if p and not os.path.exists(p):
            print(f"error: no such parquet {p}", file=sys.stderr)
            return 2

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import SparkSession, functions as F

    from drift_detection_pibic___framework_spark.operators.similarity import (
        AnnIndex)
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)

    t0 = time.time()
    spark = (SparkSession.builder.master(args.master)
             .appName("dpf-ann")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.root, exist_ok=True)
    idx = AnnIndex(ParquetTableIO(args.root), id_col=args.id_col,
                   vec_col=args.vec_col, n_files=args.n_files)

    if args.build:
        emb = spark.read.parquet(args.build)
        try:
            token = idx.build(emb, n_centroids=args.n_centroids,
                              sample_rows=args.sample_rows,
                              pq=args.pq, pq_m=args.pq_m,
                              pq_k=args.pq_k)
        except ValueError as e:          # root already holds an index
            print(f"error: {e}", file=sys.stderr)
            return 2
        pq_note = (f", pq {args.pq_m}x{args.pq_k} codebooks"
                   if args.pq else "")
        print(f"built: {emb.count()} vectors, "
              f"{args.n_centroids} centroids{pq_note}, token below")
        print(json.dumps(token))
    elif args.admit:
        try:
            idx.centroids()
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        inc = spark.read.parquet(args.admit)
        token = idx.admit(inc)
        print(f"admitted: {inc.count()} vectors, token below")
        print(json.dumps(token))
    elif args.search:
        try:
            idx.centroids()
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        q = spark.read.parquet(args.search)
        try:
            res = idx.search(spark, q, k=args.k, n_probe=args.n_probe,
                             mode=args.mode, shortlist=args.shortlist)
        except ValueError as e:          # adc/refine on a non-PQ index
            print(f"error: {e}", file=sys.stderr)
            return 2
        if args.out:
            res.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
        else:
            # one execution: persist across the head print and the count
            # (the probed join + ranking window would otherwise run twice)
            res = res.persist()
            n = res.count()
            score = "adc_score" if args.mode == "adc" else "cosine"
            for r in res.limit(10).collect():
                print(f"{r['query_id']:>8} -> {r['nbr_id']:>8} "
                      f"{score}={r[score]:.4f} rank={r['rank']}")
            # blocking: leave no async eviction behind in a shared
            # session (the in-process CLI tests share pytest's session,
            # where a straggler eviction skews cache-accounting tests)
            res.unpersist(blocking=True)
        # same hygiene for the search's own probe-frame pin
        idx.release()
        rep = idx.last_probe_report or {}
        print(f"search: {n} result rows; probe report {json.dumps(rep)}")
    elif args.rollback:
        try:
            token = json.loads(args.rollback)
            assert "cells" in token
        except Exception:
            print("error: --rollback wants the token JSON printed by "
                  "--build/--admit", file=sys.stderr)
            return 2
        try:
            idx.rollback(token)
        except (ValueError, KeyError, FileNotFoundError) as e:
            # stale/foreign token or unbuilt root: usage error, not a
            # traceback (docstring contract: exit 2 on bad arguments)
            print(f"error: cannot roll back to {token['cells']!r}: {e}",
                  file=sys.stderr)
            return 2
        print(f"rolled back to snapshot {token['cells']}")
    elif args.compact:
        if not idx.io.snapshots(AnnIndex.CELLS):
            print("error: index not built", file=sys.stderr)
            return 2
        snap = idx.compact(spark)
        print(f"compacted to snapshot {snap} "
              f"({idx.n_files} clustered files)")
    elif args.stream_admit:
        from drift_detection_pibic___framework_spark.streaming.stream_ann_admit import (  # noqa: E501
            ann_admission_stream)
        if not os.path.isdir(args.stream_admit):
            print(f"error: no such feed dir {args.stream_admit}",
                  file=sys.stderr)
            return 2
        out = args.admitted_out or os.path.join(args.root,
                                                "admitted_epochs")
        schema = (args.feed_schema or
                  f"{args.id_col} bigint, {args.vec_col} array<float>")
        try:
            q = ann_admission_stream(
                spark, args.stream_admit, schema, out, args.checkpoint,
                args.root, id_col=args.id_col, vec_col=args.vec_col)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        q.awaitTermination()
        # the sink accumulates across runs (and may not exist after a
        # vacuous run over an empty/fully-processed feed) — report the
        # sink TOTAL, in one aggregation pass, without crashing on a
        # zero-epoch stream
        if os.path.exists(out):
            # any OTHER failure (permissions, corruption, schema) must
            # propagate — a bare except here reported real errors as
            # "sink holds 0 vectors" (ADVICE r5)
            agg = (spark.read.parquet(out)
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.countDistinct("epoch").alias("epochs"))
                   .collect()[0])
            n, epochs = agg["n"], agg["epochs"]
        else:           # vacuous run over an empty/fully-processed feed
            n = epochs = 0
        print(f"stream-admit: sink {out} holds {n} vectors over "
              f"{epochs} epochs (cumulative across runs)")
    elif args.describe:
        io = idx.io
        if not io.snapshots(AnnIndex.CELLS):
            print("error: index not built", file=sys.stderr)
            return 2
        rep = dict(io.describe_table(AnnIndex.CELLS))
        st = idx._state()
        rep["n_centroids"] = int(st["n_centroids"])
        if "codebooks" in st:
            B = st["codebooks"]
            rep["pq"] = {"m": len(B), "k": len(B[0]),
                         "dsub": len(B[0][0])}
        print(json.dumps(rep, indent=2))
    print(f"done in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
