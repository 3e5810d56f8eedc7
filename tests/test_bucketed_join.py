"""Bucketed-layout evidence for the production join strategy.

The invariant operators document the 100 TB contract: clips and clips_ref
bucketed by rid -> the per-row compare join needs NO exchange (the
filepairs path plays this role in the sandbox). This test PROVES the
claim mechanically in this codebase: two tables bucketed by rid on the
same bucket count join with zero Exchange nodes, while the same join on
plain parquet shuffles both sides.
"""

import pytest


@pytest.fixture(scope="module")
def bucketed(spark, clips, clips_ref, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    old = spark.conf.get("spark.sql.warehouse.dir", None)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{wh}'")
    (clips.select("rid", "bytes", "codec", "dur_ms", "transcript")
     .write.bucketBy(8, "rid").sortBy("rid")
     .mode("overwrite").saveAsTable("bkt.clips_b"))
    (clips_ref.select("rid", "bytes", "codec", "transcript")
     .write.bucketBy(8, "rid").sortBy("rid")
     .mode("overwrite").saveAsTable("bkt.ref_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS bkt.clips_b")
    spark.sql("DROP TABLE IF EXISTS bkt.ref_b")
    spark.sql("DROP DATABASE IF EXISTS bkt")
    _ = old


def _join_plan(spark, left, right):
    import io
    from contextlib import redirect_stdout
    df = left.join(right.withColumnRenamed("bytes", "ref_bytes")
                   .withColumnRenamed("codec", "ref_codec")
                   .withColumnRenamed("transcript", "ref_transcript"),
                   "rid")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return df, buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """Both sides bucketed by rid on the same bucket count: the equi-join
    is co-located — ZERO Exchange nodes (this is what an Iceberg
    bucket-partitioned layout gives the 1000-executor invariant join)."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df, plan = _join_plan(spark, spark.table("bkt.clips_b"),
                              spark.table("bkt.ref_b"))
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it computes the right thing
        n = df.count()
        assert n == spark.table("bkt.clips_b").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_unbucketed_join_shuffles_both_sides(spark, clips, clips_ref):
    """Control: the same join over plain parquet exchanges BOTH sides —
    the cost the bucketed layout removes."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        _, plan = _join_plan(
            spark,
            clips.select("rid", "bytes", "codec", "dur_ms", "transcript"),
            clips_ref.select("rid", "bytes", "codec", "transcript"))
        assert plan.count("Exchange") >= 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
