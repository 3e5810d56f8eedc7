"""as-of join: semantics vs a bisect reference, tie rules, plan shape."""

import bisect
import datetime as dt

import pytest
from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.operators.asof import asof_join


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], _ts(i % 12, 7 * i % 60), float(i) * 1.5)
         for i in range(40)],
        "event_id long, k string, ts timestamp_ntz, v double")
    right = spark.createDataFrame(
        [("a", _ts(0), 10), ("a", _ts(3), 11), ("a", _ts(9), 12),
         ("b", _ts(2), 20), ("b", _ts(2, 14), 21), ("b", _ts(11, 59), 22)],
        "k string, cp_ts timestamp_ntz, cp long")
    return left, right


def _reference(lrows, rrows):
    """Per-key bisect: latest right with cp_ts <= ts (inclusive)."""
    by_key = {}
    for k, cp_ts, cp in rrows:
        by_key.setdefault(k, []).append((cp_ts, cp))
    for v in by_key.values():
        v.sort()
    out = {}
    for event_id, k, ts, _v in lrows:
        cands = by_key.get(k, [])
        i = bisect.bisect_right([c[0] for c in cands], ts)
        out[event_id] = cands[i - 1] if i else (None, None)
    return out


def test_matches_bisect_reference(spark, frames):
    left, right = frames
    got = {r["event_id"]: (r["cp_ts"], r["cp"])
           for r in asof_join(left, right, on=["k"], left_ts="ts",
                              right_ts="cp_ts", values=["cp"]).collect()}
    want = _reference([tuple(r) for r in left.collect()],
                      [tuple(r) for r in right.collect()])
    assert got == want
    assert len(got) == 40                       # left join keeps all rows


def test_tie_is_inclusive(spark):
    left = spark.createDataFrame([(1, "a", _ts(5))],
                                 "event_id long, k string, ts timestamp_ntz")
    right = spark.createDataFrame([("a", _ts(5), 99)],
                                  "k string, cp_ts timestamp_ntz, cp long")
    row = asof_join(left, right, on=["k"], left_ts="ts", right_ts="cp_ts",
                    values=["cp"]).collect()[0]
    assert row["cp"] == 99 and row["cp_ts"] == _ts(5)


def test_inner_drops_unmatched(spark, frames):
    left, right = frames
    inner = asof_join(left, right, on=["k"], left_ts="ts",
                      right_ts="cp_ts", values=["cp"], how="inner")
    outer = asof_join(left, right, on=["k"], left_ts="ts",
                      right_ts="cp_ts", values=["cp"], how="left")
    n_unmatched = outer.filter(F.col("cp_ts").isNull()).count()
    assert n_unmatched > 0                      # fixture has pre-cp rows
    assert inner.count() == outer.count() - n_unmatched


def test_collision_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("cp", "v"), on=["k"],
                  left_ts="ts", right_ts="cp_ts", values=["v"])


def test_single_shuffle_no_nested_loop(spark, frames):
    """The 100-TB claim: union-tag form = ONE hash exchange on the key,
    never a BroadcastNestedLoopJoin (what a naive non-equi join plans)."""
    left, right = frames
    plan = asof_join(left, right, on=["k"], left_ts="ts", right_ts="cp_ts",
                     values=["cp"])._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
