"""Spark detector kernels must reproduce the numpy oracle EXACTLY
(SURVEY §5: 'the Spark vectorized kernels must reproduce the oracle's
flag/warning sequences exactly'), including under repartitioning and when
resumed from a mid-stream checkpoint."""

import json
import os

import pytest

from drift_detection_pibic___framework_spark.operators.detectors import (
    config, harness, kernels)
from drift_detection_pibic___framework_spark.sources import generators as G

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden", "detector_flags.json")))


@pytest.fixture(scope="module")
def streams_df(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/drift_streams.parquet")


@pytest.fixture(scope="module")
def spark_detections(spark, streams_df):
    res = kernels.detect(streams_df)
    det = kernels.detections_only(res).collect()
    out = {}
    for r in det:
        out.setdefault(f"{r['detector']}|{r['stream_id']}", []).append(r["seq"])
    return out


@pytest.mark.parametrize("det", sorted(config.DETECTOR_SUITE))
@pytest.mark.parametrize("sid", G.STREAM_IDS)
def test_spark_flags_equal_golden(spark_detections, det, sid):
    assert spark_detections.get(f"{det}|{sid}", []) == GOLDEN[f"{det}|{sid}"]


def test_order_independence_of_input_partitioning(spark, streams_df):
    """The kernel sorts by seq inside each group, so an adversarial
    repartition/shuffle of the input must not change a single flag."""
    shuffled = streams_df.repartition(13).sortWithinPartitions("err")
    det = kernels.detections_only(kernels.detect(shuffled, ["ddm", "adwin"]))
    got = {}
    for r in det.collect():
        got.setdefault(f"{r['detector']}|{r['stream_id']}", []).append(r["seq"])
    for det_name in ("ddm", "adwin"):
        for sid in G.STREAM_IDS:
            assert got.get(f"{det_name}|{sid}", []) == GOLDEN[f"{det_name}|{sid}"]


def test_warning_and_state_columns_match_oracle(spark, streams_df):
    pdf = (kernels.detect(streams_df, ["ddm"])
           .filter("stream_id = 'abrupt_mean'")
           .orderBy("seq").toPandas())
    s = G.generate_drift_stream("abrupt_mean").to_pandas()
    r = harness.run_prequential("ddm", s["err"].to_numpy(),
                                s["value"].to_numpy(),
                                **config.suite_kwargs("ddm"))
    assert pdf["state"].tolist() == r.states
    assert pdf.loc[pdf["warning"], "seq"].tolist() == r.warnings


def test_resume_from_checkpoint_bitwise_identical(spark, streams_df):
    """Split every stream at seq 1200; run prefix -> checkpoint states ->
    run suffix with initial_states. Flags must equal the uninterrupted run
    (north_rule resumability at the detector-state level)."""
    cut = 1200
    prefix = streams_df.filter(f"seq < {cut}")
    suffix = streams_df.filter(f"seq >= {cut}")
    dets = ["ddm", "page_hinkley", "hddm_w", "kswin"]

    st = {(r["stream_id"], r["detector"]): bytes(r["state_blob"])
          for r in kernels.final_states(prefix, dets).collect()}
    part1 = kernels.detections_only(kernels.detect(prefix, dets)).collect()
    part2 = kernels.detections_only(
        kernels.detect(suffix, dets, initial_states=st)).collect()
    got = {}
    for r in list(part1) + list(part2):
        got.setdefault(f"{r['detector']}|{r['stream_id']}", []).append(r["seq"])
    for d in dets:
        for sid in G.STREAM_IDS:
            assert sorted(got.get(f"{d}|{sid}", [])) == GOLDEN[f"{d}|{sid}"], \
                (d, sid)
