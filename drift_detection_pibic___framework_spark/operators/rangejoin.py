"""Distributed range (interval-containment) join via bucket decomposition.

Catalyst executes a non-equi temporal predicate
(``p.ts BETWEEN i.start AND i.end``) as a BroadcastNestedLoopJoin — O(P*I)
compares and a broadcast of a whole side, which dies long before 10^12
rows.  The scale-safe form decomposes time into fixed-width buckets:

1. each interval explodes into the bucket indexes it covers
   (``sequence(bucket(start), bucket(end))`` — one narrow generate);
2. each point maps to exactly ONE bucket, so an equi-join on
   (keys..., bucket) finds every candidate pair exactly once — no
   post-join dedup needed;
3. the exact ``start <= ts <= end`` filter runs bucket-locally.

Cost: one hash shuffle on (keys, bucket) of |points| + sum(interval
spans) rows.  Pick ``bucket_width_sec`` near the TYPICAL interval length:
width >> intervals wastes filter work (many points per bucket); width <<
intervals explodes long intervals into many buckets.  A pathological
interval (days long against a seconds-wide bucket) is the skew hazard —
clamp or split such intervals upstream.

Timestamps are bucketed via ``timestampdiff`` from a fixed origin because
TIMESTAMP_NTZ admits no epoch cast (Spark 4); the origin only needs to
precede the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_ORIGIN = "timestamp'2000-01-01 00:00:00'"


def _bucket(ts_col: str, width_sec: int) -> Column:
    secs = F.expr(f"timestampdiff(SECOND, {_ORIGIN}, {ts_col})")
    return F.floor(secs / F.lit(width_sec)).cast("long")


def range_join(points: DataFrame, intervals: DataFrame, on: Sequence[str],
               point_ts: str, start_ts: str, end_ts: str,
               bucket_width_sec: int = 300) -> DataFrame:
    """Inner-join each point row to every interval row (matching on the
    ``on`` keys) whose ``[start_ts, end_ts]`` contains ``point_ts``
    (inclusive both ends).  Returns all columns of both inputs; non-key
    column names must not overlap."""
    on = list(on)
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(f"non-key columns overlap: {sorted(overlap)}")
    iv = intervals.withColumn(
        "_rj_bucket",
        F.explode(F.sequence(_bucket(start_ts, bucket_width_sec),
                             _bucket(end_ts, bucket_width_sec))))
    pt = points.withColumn("_rj_bucket", _bucket(point_ts, bucket_width_sec))
    return (pt.join(iv, on + ["_rj_bucket"])
            .filter((F.col(point_ts) >= F.col(start_ts))
                    & (F.col(point_ts) <= F.col(end_ts)))
            .drop("_rj_bucket"))
