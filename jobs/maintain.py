"""Table maintenance entry point for TableIO roots.

The batch/stream jobs only ever ADD state (snapshots, delete markers,
stats sidecars, manifest rows); this job is the scheduled janitor that
bounds each of those at production commit counts:

    spark-submit jobs/maintain.py --root <tableio_root> --table <name> \
        [--rewrite] [--compact-stats N] [--vacuum]

- ``--rewrite``: major compaction — materialize the merge-on-read state
  as ONE rewrite commit (physically applying equality deletes / upserts)
  and retire the history.  Time travel to retired snapshots is lost.
- ``--expire N``: bounded-history retention — fold everything except the
  newest N commits into a prefix rewrite; recent time travel survives.
- ``--compact-stats N``: fold all but the newest N stats sidecars into
  the mergeable baseline sidecar (gate metadata becomes O(N)).
- ``--vacuum``: delete data dirs no live log entry references (rolled
  back, crash-orphaned, or retired by --rewrite).  Only safe with no
  concurrent writer on the table.

Exit 0 on success, 2 on bad arguments/paths.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="TableIO root directory")
    ap.add_argument("--table", required=True)
    ap.add_argument("--rewrite", action="store_true")
    ap.add_argument("--cluster-by", default=None, metavar="COL[,COL]",
                    help="with --rewrite: restore clustering while "
                         "rewriting (one col = range layout, several = "
                         "z-order) and re-harvest per-file footer stats "
                         "so read_where pruning is selective again")
    ap.add_argument("--expire", type=int, default=0, metavar="N")
    ap.add_argument("--compact-stats", type=int, default=0, metavar="N")
    ap.add_argument("--vacuum", action="store_true")
    ap.add_argument("--describe", action="store_true",
                    help="print the metadata-only table health report")
    ap.add_argument("--master",
                    default=os.environ.get("SPARK_MASTER", "local[8]"))
    args = ap.parse_args()

    if not os.path.isdir(args.root):
        print(f"error: no such root {args.root}", file=sys.stderr)
        return 2

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)

    t0 = time.time()
    spark = (SparkSession.builder.master(args.master)
             .appName("dpf-maintain")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    io = ParquetTableIO(args.root)
    if not io.snapshots(args.table):
        print(f"error: table {args.table} has no committed snapshot",
              file=sys.stderr)
        return 2

    if args.rewrite:
        before = len(io.snapshots(args.table))
        by = args.cluster_by.split(",") if args.cluster_by else None
        snap = io.compact_snapshots(spark, args.table, cluster_by=by)
        tag = f", clustered by {by}" if by else ""
        print(f"rewrite: {before} commits -> 1 (snap-{snap}{tag})")
    if args.expire:
        n = io.expire_snapshots(spark, args.table, keep_last=args.expire)
        print(f"expire: folded {n} commits (keep_last={args.expire})")
    if args.compact_stats:
        n = io.compact_stats(spark, args.table,
                             keep_last=args.compact_stats)
        print(f"compact-stats: folded {n} sidecars "
              f"(keep_last={args.compact_stats})")
    if args.vacuum:
        n = io.vacuum(args.table)
        print(f"vacuum: removed {n} unreferenced data dirs")
    if args.describe:
        import json
        print(json.dumps(io.describe_table(args.table), indent=2))
    print(f"done in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
