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


def test_batch_invariant_empty_batch():
    """Empty Arrow batch returns an empty frame with the result columns
    (the kernel used to IndexError on starts[0] with n=0)."""
    import pandas as pd
    out = invariant._batch_invariant(pd.DataFrame({
        "rid": [], "clip_id": [], "part": [], "bytes": [], "codec": [],
        "dur_ms": [], "transcript": [], "ref_bytes": [], "ref_codec": [],
        "ref_transcript": []}), 8000)
    assert len(out) == 0
    assert list(out.columns) == ["rid", "clip_id", "part", "snr_db",
                                 "len_ok", "transcript_ok", "passed"]


def test_batch_invariant_chunked_matches_single():
    """A batch wider than _CHUNK_ROWS splits into bounded sub-chunks whose
    concatenated result is identical to one unchunked kernel call."""
    import numpy as np
    import pandas as pd

    from drift_detection_pibic___framework_spark.functions import audio

    rng = np.random.default_rng(7)
    rows = invariant._CHUNK_ROWS * 2 + 37
    recs = []
    for i in range(rows):
        n = int(rng.integers(8, 64))
        sig = (rng.standard_normal(n) * 3000).astype(np.int16)
        codec = ["pcm16", "mulaw", "alaw"][i % 3]
        enc = audio.encode(sig, codec)
        recs.append((i, f"c{i}", i % 4, enc, codec,
                     n * 1000.0 / 8000, f"t{i}", enc, codec, f"t{i}"))
    batch = pd.DataFrame(recs, columns=[
        "rid", "clip_id", "part", "bytes", "codec", "dur_ms", "transcript",
        "ref_bytes", "ref_codec", "ref_transcript"])
    single = invariant._chunk_invariant(batch, 8000)
    chunked = invariant._batch_invariant(batch, 8000)
    pd.testing.assert_frame_equal(
        chunked, single.reset_index(drop=True), check_dtype=True)
