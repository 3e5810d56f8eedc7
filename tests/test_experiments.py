"""Experiment-grid runner: stream x detector x rep sweep -> metrics ->
mean/std summary (reference experimento/ExperimentoDrift.py analogue)."""

import pytest


@pytest.fixture(scope="module")
def streams(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/drift_streams.parquet").cache()


def test_grid_shape_and_delays(spark, streams):
    from drift_detection_pibic___framework_spark.plans import experiments
    res = experiments.grid_results(
        spark, streams, detectors=["page_hinkley", "ddm"], reps=2).toPandas()
    # full grid: 5 streams x 2 detectors x 2 reps
    assert len(res) == 5 * 2 * 2
    assert set(res["rep"]) == {0, 1}
    # abrupt shift: page-hinkley detects after the cp with bounded delay
    ph = res[(res.stream_id == "abrupt_mean")
             & (res.detector == "page_hinkley")]
    assert (ph["delay"].notna()).all()
    assert (ph["delay"] >= 0).all() and (ph["delay"] < 500).all()
    # no_drift: delay undefined, detections (if any) are all false alarms
    nd = res[res.stream_id == "no_drift"]
    assert nd["delay"].isna().all()
    assert (nd["n_detections"] == nd["false_alarms"]).all()


def test_grid_summary_and_determinism(spark, streams, tmp_path):
    from drift_detection_pibic___framework_spark.plans import experiments
    out = str(tmp_path / "exp")
    a = experiments.run_grid(spark, streams,
                             detectors=["page_hinkley"], reps=3,
                             out_dir=out).toPandas()
    b = experiments.run_grid(spark, streams,
                             detectors=["page_hinkley"], reps=3).toPandas()
    # deterministic: hash-derived rep noise, not F.rand
    assert a.equals(b)
    assert len(a) == 5 and (a["n_reps"] == 3).all()
    # persisted results table (FileManager analogue)
    persisted = spark.read.parquet(f"{out}/grid_summary").toPandas()
    assert len(persisted) == 5
    res = spark.read.parquet(f"{out}/grid_results")
    assert res.count() == 5 * 3
