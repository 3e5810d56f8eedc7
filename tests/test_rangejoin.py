"""range_join: semantics vs a nested-loop reference, bucket widths, plan."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.operators.rangejoin import (
    range_join)


def _ts(d, h, m=0):
    return dt.datetime(2024, 1, d, h, m)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, ["u1", "u2"][i % 2], _ts(1 + i % 3, (5 * i) % 24, (13 * i) % 60))
         for i in range(60)]
        + [(997, "u1", _ts(1, 8, 30))],   # inside BOTH 100 and 104
        "pid long, k string, ts timestamp_ntz")
    intervals = spark.createDataFrame(
        [(100, "u1", _ts(1, 2), _ts(1, 9)),
         (101, "u1", _ts(2, 0), _ts(2, 0, 30)),     # sub-bucket interval
         (102, "u2", _ts(1, 20), _ts(2, 4)),        # crosses midnight
         (103, "u2", _ts(3, 0), _ts(3, 23, 59)),
         (104, "u1", _ts(1, 8), _ts(1, 12))],       # overlaps 100
        "iid long, k string, s timestamp_ntz, e timestamp_ntz")
    return points, intervals


def _reference(prows, irows):
    out = set()
    for pid, pk, ts in prows:
        for iid, ik, s, e in irows:
            if pk == ik and s <= ts <= e:
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("width", [60, 3600, 86400 * 7])
def test_matches_nested_loop_reference(spark, frames, width):
    """Result is bucket-width invariant: tiny, typical and huge buckets
    all reproduce the exact containment set (each point lives in ONE
    bucket, so no width can double-count a pair)."""
    points, intervals = frames
    got = {(r["pid"], r["iid"])
           for r in range_join(points, intervals, on=["k"], point_ts="ts",
                               start_ts="s", end_ts="e",
                               bucket_width_sec=width).collect()}
    want = _reference([tuple(r) for r in points.collect()],
                      [tuple(r) for r in intervals.collect()])
    assert got == want and len(want) > 0


def test_overlapping_intervals_both_match(spark, frames):
    points, intervals = frames
    j = range_join(points, intervals, on=["k"], point_ts="ts",
                   start_ts="s", end_ts="e", bucket_width_sec=3600)
    per_point = (j.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
                 .filter("n > 1").count())
    assert per_point > 0        # fixture has points inside 100 AND 104


def test_overlap_columns_raise(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="overlap"):
        range_join(points, intervals.withColumnRenamed("s", "ts"),
                   on=["k"], point_ts="ts", start_ts="ts", end_ts="e")


def test_no_nested_loop_plan(spark, frames):
    """The operator's reason to exist: the plan is an equi SortMergeJoin /
    ShuffledHashJoin on (k, bucket), never BroadcastNestedLoop/cartesian."""
    points, intervals = frames
    plan = range_join(points, intervals, on=["k"], point_ts="ts",
                      start_ts="s", end_ts="e")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
