"""Per-row invariant check (decode + SNR + transcript) end-to-end on Spark,
including injected corruption."""

import pytest
from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.operators import invariant


@pytest.fixture(scope="module")
def results(spark, clips, clips_ref):
    return invariant.invariant_results(clips, clips_ref).cache()


def test_pristine_bytes_pass_snr(results):
    """Default fixture bytes are uncorrupted: every row's SNR passes; the
    only failures are the injected null transcripts (p2/p10)."""
    bad = results.filter("not passed").toPandas()
    assert set(bad["part"]) == {2, 10}
    assert (~bad["transcript_ok"]).all()
    assert (bad["snr_db"] >= invariant.SNR_THRESHOLD_DB).all()
    assert bad["len_ok"].all()


def test_row_counts_match_input(results, clips):
    assert results.count() == clips.count()


def test_length_consistency_all_rows(results):
    assert results.filter("not len_ok").count() == 0


def test_verdicts_flag_null_transcript_parts(spark, clips, clips_ref):
    v = invariant.invariant_verdicts(clips, clips_ref).toPandas() \
        .set_index("part")
    assert set(v.index[~v["passed"]]) == {2, 10}


def test_corrupted_bytes_fail_snr(spark, clips, clips_ref):
    """Flip payloads of part 6 to noise -> SNR < 30 dB -> violations."""
    corrupted = clips.withColumn(
        "bytes",
        F.when(F.col("part") == 6,
               F.substring(F.reverse(F.col("bytes")), 1, 64))
        .otherwise(F.col("bytes")))
    res = invariant.invariant_results(corrupted, clips_ref)
    bad = res.filter("not passed").filter("part = 6")
    n_p6 = clips.filter("part = 6").count()
    assert bad.count() == n_p6
    viol = invariant.invariant_violations(corrupted, clips_ref) \
        .filter("part = 6").limit(1).collect()[0]
    assert viol["check_name"] == "invariant(pcm_snr)"
    assert "len_ok=false" in viol["observed"]


def test_transcript_mismatch_detected(spark, clips, clips_ref):
    tampered = clips.withColumn(
        "transcript",
        F.when(F.col("part") == 1, F.lit("tampered words"))
        .otherwise(F.col("transcript")))
    res = invariant.invariant_results(tampered, clips_ref)
    p1 = res.filter("part = 1").toPandas()
    assert (~p1["transcript_ok"]).all()
    assert (p1["snr_db"] >= 30).all()  # audio untouched


def test_colocated_equals_join_variant(spark, clips, clips_ref, fixture_dir):
    """The zero-shuffle colocated path must produce row-identical results
    to the join formulation."""
    a = (invariant.invariant_results(clips, clips_ref)
         .orderBy("rid").collect())
    b = (invariant.invariant_results_colocated(clips, f"{fixture_dir}/clips_ref")
         .orderBy("rid").collect())
    assert a == b


def test_filepairs_equals_join_variant(spark, clips, clips_ref, fixture_dir):
    a = (invariant.invariant_results(clips, clips_ref)
         .orderBy("rid").collect())
    b = (invariant.invariant_results_filepairs(
            spark, f"{fixture_dir}/clips", f"{fixture_dir}/clips_ref")
         .orderBy("rid").collect())
    assert a == b
