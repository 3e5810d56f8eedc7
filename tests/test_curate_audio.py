"""End-to-end audio curation job: quarantine -> quality screen ->
fused standardize -> curated write (jobs/curate_audio.py)."""

import sys

import numpy as np

from drift_detection_pibic___framework_spark.functions import audio
from drift_detection_pibic___framework_spark.operators import quarantine as QR


def test_curate_audio_job_end_to_end(spark, fixture_dir, tmp_path,
                                     monkeypatch):
    """The job must admit exactly the quarantine-clean rows (at default
    screen thresholds the fixture loses nothing further), and every
    curated payload must be pcm_s16le at the target rate, peak-bounded,
    with dur_ms consistent with the payload length."""
    import jobs.curate_audio as J

    out = str(tmp_path / "curated")
    monkeypatch.setattr(sys, "argv", [
        "curate_audio.py", "--data", fixture_dir, "--out", out,
        "--target-rate", "1000", "--target-dbfs", "-20"])
    assert J.main() == 0

    clips = spark.read.parquet(f"{fixture_dir}/clips")
    dim = spark.read.parquet(f"{fixture_dir}/allowed_codecs.parquet")
    clean, _ = QR.quarantine(clips, dim)
    n_clean = clean.count()

    cur = spark.read.parquet(out)
    assert cur.count() == n_clean
    assert cur.filter("codec <> 'pcm_s16le' or sr_hz <> 1000").count() == 0

    sample = cur.limit(20).collect()
    for r in sample:
        pcm = audio.pcm_s16le_decode(bytes(r["bytes"]))
        assert r["dur_ms"] == round(len(pcm) * 1000.0 / 1000)
        assert np.abs(pcm).max() <= 32767 * 0.9995
    # loudness actually unified: every non-limited clip sits at -20 dBFS
    lvl = [20 * np.log10(np.sqrt(np.mean(
        (audio.pcm_s16le_decode(bytes(r["bytes"])) / 32767.0) ** 2)))
        for r in sample if not r["limited"]]
    assert lvl and max(abs(v + 20.0) for v in lvl) < 0.1


def test_curate_audio_job_dedup_conflicts_band(spark, fixture_dir,
                                               tmp_path, monkeypatch):
    """The optional stages compose: label conflicts drop BOTH members of
    conflicting near-identical pairs, exact payload dedup removes what
    survives with identical bytes, and --band-features lands acoustic
    columns on every curated row."""
    import jobs.curate_audio as J

    out = str(tmp_path / "curated")
    monkeypatch.setattr(sys, "argv", [
        "curate_audio.py", "--data", fixture_dir, "--out", out,
        "--dedup-audio", "0", "--drop-label-conflicts",
        "--band-features"])
    assert J.main() == 0

    clips = spark.read.parquet(f"{fixture_dir}/clips")
    dim = spark.read.parquet(f"{fixture_dir}/allowed_codecs.parquet")
    clean, _ = QR.quarantine(clips, dim)
    n_clean = clean.count()

    cur = spark.read.parquet(out)
    n_cur = cur.count()
    assert 0 < n_cur < n_clean            # both stages removed something
    for c in [f"band_frac_{j}" for j in range(6)] + [
            "spectral_flatness", "rolloff_hz"]:
        assert c in cur.columns
    assert cur.filter("spectral_flatness is null").count() == 0
    # fractions are a distribution per row
    row = cur.limit(1).collect()[0]
    assert abs(sum(row[f"band_frac_{j}"] for j in range(6)) - 1.0) < 1e-3


def test_curate_audio_wer_adjudication(spark, fixture_dir, tmp_path,
                                       monkeypatch):
    """--wer-threshold relaxes the blanket conflict drop into
    adjudication: at a huge threshold every conflict reads as
    transcription noise, so no pair members are dropped at stage 2b and
    the curated table is strictly larger than the blanket-drop run
    (payload dedup may still collapse the H=0 twins).  The flag without
    --drop-label-conflicts is a usage error."""
    import jobs.curate_audio as J

    out_blanket = str(tmp_path / "blanket")
    monkeypatch.setattr(sys, "argv", [
        "curate_audio.py", "--data", fixture_dir, "--out", out_blanket,
        "--dedup-audio", "0", "--drop-label-conflicts"])
    assert J.main() == 0
    n_blanket = spark.read.parquet(out_blanket).count()

    out_keep = str(tmp_path / "adjudicated")
    monkeypatch.setattr(sys, "argv", [
        "curate_audio.py", "--data", fixture_dir, "--out", out_keep,
        "--dedup-audio", "0", "--drop-label-conflicts",
        "--wer-threshold", "1e9"])
    assert J.main() == 0
    n_keep = spark.read.parquet(out_keep).count()
    assert n_keep > n_blanket

    monkeypatch.setattr(sys, "argv", [
        "curate_audio.py", "--data", fixture_dir,
        "--wer-threshold", "0.3"])
    assert J.main() == 2
