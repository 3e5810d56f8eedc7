"""Detector oracle tests: golden flag sequences, detection-delay bounds,
zero false positives on the control stream, 3-state machine, KS math.

Reproduces the reference's drift-flag-sequence semantics
(/root/reference/avaliacao/DriftEvaluator.py:53-130) on the FIXTURES.md §3
synthetic concept-drift streams.
"""

import json
import os

import numpy as np
import pytest

from drift_detection_pibic___framework_spark.operators.detectors import (
    config, harness, oracle)
from drift_detection_pibic___framework_spark.sources import generators as G

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden", "detector_flags.json")))
DETECTORS = list(config.DETECTOR_SUITE)

# change point per scenario; None = no single change point
CHANGE_POINT = {"abrupt_mean": 1000, "gradual_mean": 800,
                "variance_shift": 1000, "recurring": 700, "no_drift": None}
# (detector, scenario) pairs where detection is structurally expected;
# delay bound = samples after the change point within which the FIRST flag
# must land (gradual ramp ends at 1200, so its bound is wider)
EXPECTED_DETECTION = {
    ("ddm", "abrupt_mean", 150), ("ddm", "recurring", 100),
    ("ddm", "variance_shift", 150),
    ("eddm", "abrupt_mean", 100), ("eddm", "recurring", 100),
    ("adwin", "abrupt_mean", 100), ("adwin", "recurring", 100),
    ("adwin", "variance_shift", 150),
    ("page_hinkley", "abrupt_mean", 150), ("page_hinkley", "recurring", 150),
    ("kswin", "abrupt_mean", 100), ("kswin", "recurring", 100),
    ("fhddm", "abrupt_mean", 100), ("fhddm", "recurring", 100),
    ("fhddm", "variance_shift", 100),
    ("hddm_a", "abrupt_mean", 100), ("hddm_a", "recurring", 100),
    ("hddm_a", "variance_shift", 100),
    ("hddm_w", "abrupt_mean", 100), ("hddm_w", "recurring", 100),
}


@pytest.fixture(scope="module")
def streams():
    return G.generate_drift_streams().to_pandas()


def _run(det, streams, sid):
    s = streams[streams.stream_id == sid].sort_values("seq")
    return harness.run_prequential(det, s["err"].to_numpy(),
                                   s["value"].to_numpy(),
                                   **config.suite_kwargs(det))


@pytest.mark.parametrize("det", DETECTORS)
@pytest.mark.parametrize("sid", G.STREAM_IDS)
def test_golden_flag_sequences(det, streams, sid):
    r = _run(det, streams, sid)
    assert r.detections == GOLDEN[f"{det}|{sid}"]


@pytest.mark.parametrize("det", DETECTORS)
def test_no_drift_zero_flags(det, streams):
    assert _run(det, streams, "no_drift").detections == []


@pytest.mark.parametrize("det,sid,bound",
                         sorted(EXPECTED_DETECTION))
def test_detection_delay(det, sid, bound, streams):
    r = _run(det, streams, sid)
    cp = CHANGE_POINT[sid]
    after = [d for d in r.detections if d >= cp]
    assert after, f"{det} missed the change at {cp} in {sid}"
    assert after[0] - cp <= bound, \
        f"{det} delay {after[0] - cp} > {bound} in {sid}"


def test_recurring_detects_both_transitions(streams):
    """The recurring scenario shifts at 700 and reverts at 1400; detectors
    with two-sided / distribution tests must flag both."""
    for det in ("kswin", "adwin", "page_hinkley"):
        r = _run(det, streams, "recurring")
        assert any(700 <= d < 1400 for d in r.detections), det
        assert any(d >= 1400 for d in r.detections), det


def test_three_state_machine_mapping():
    """framework_detector.py:134-147: drift => MUDANÇA, warning => ALERTA."""
    d = oracle.DDM()
    assert d.state() == oracle.STATE_NORMAL
    d.drift_detected = True
    assert d.state() == oracle.STATE_DRIFT
    d.drift_detected, d.warning_detected = False, True
    assert d.state() == oracle.STATE_WARNING


def test_states_emitted_per_sample(streams):
    s = streams[streams.stream_id == "abrupt_mean"].sort_values("seq")
    r = harness.run_prequential("ddm", s["err"].to_numpy(),
                                s["value"].to_numpy())
    assert len(r.states) == len(s) - 50  # processed samples only
    assert r.states[r.detections[0] - 50] == oracle.STATE_DRIFT
    assert set(r.states) <= {oracle.STATE_NORMAL, oracle.STATE_WARNING,
                             oracle.STATE_DRIFT}


def test_post_drift_reset_semantics(streams):
    """DriftEvaluator.py:104-123: after a drift, a FRESH detector is built
    once tamanho_batch samples are collected — so on abrupt_mean (permanent
    shift) the detector must NOT re-flag the same shift after re-seeding."""
    s = streams[streams.stream_id == "abrupt_mean"].sort_values("seq")
    r = harness.run_prequential("ddm", s["err"].to_numpy(),
                                s["value"].to_numpy())
    assert len(r.detections) == 1


def test_ks_2samp_known_values():
    a = np.linspace(0, 1, 100)
    d, p = oracle.ks_2samp(a, a + 0.5)
    assert d == 0.5 and p < 1e-6
    d2, p2 = oracle.ks_2samp(a, a)
    assert d2 < 0.011 and p2 > 0.99


def test_ddm_warning_precedes_drift():
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.random(500) < 0.1,
                        rng.random(200) < 0.6]).astype(float)
    det = oracle.DDM()
    warns, drift_idx = [], None
    for i, v in enumerate(x):
        det.update(v)
        if det.warning_detected:
            warns.append(i)
        if det.drift_detected:
            drift_idx = i
            break
    assert drift_idx is not None and 500 <= drift_idx <= 560
    # ALERTA zone immediately precedes MUDANÇA (3-state semantics)
    assert drift_idx - 1 in warns
