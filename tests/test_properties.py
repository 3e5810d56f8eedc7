"""Property-based tests (hypothesis) for the pure-python kernels.

These pin the two invariants everything else leans on:
- detector steppers are RESUMABLE: serializing mid-stream and resuming
  yields exactly the flags of an uninterrupted run, for every detector and
  any split point (the manifest-checkpoint and streaming-state contract);
- the G.711 codecs ROUND-TRIP above the invariant's own SNR threshold, so
  a pristine pipeline can never fail the PCM-SNR check.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from drift_detection_pibic___framework_spark.functions import audio
from drift_detection_pibic___framework_spark.operators.detectors import (
    config as det_config)
from drift_detection_pibic___framework_spark.operators.detectors.harness import (
    PrequentialStepper)


def _run(name, errs, vals, split=None):
    kw = det_config.suite_kwargs(name)
    stepper = PrequentialStepper(name, 50, kw["params"], kw["bin_threshold"])
    out = []
    for i, (e, v) in enumerate(zip(errs, vals)):
        if split is not None and i == split:
            stepper = PrequentialStepper.deserialize(stepper.serialize())
        out.append(stepper.step(float(e), float(v)))
    return out


@settings(max_examples=15, deadline=None)
@given(data=st.data(),
       n=st.integers(min_value=5, max_value=220),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
@pytest.mark.parametrize("det", list(det_config.DETECTOR_SUITE))
def test_stepper_resume_equals_uninterrupted(det, data, n, seed):
    """serialize() at ANY point mid-stream, deserialize(), continue ->
    byte-identical (flag, warning, state) sequence to never pausing."""
    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 1, n)
    errs = np.abs(vals + rng.normal(0, 0.05, n))
    split = data.draw(st.integers(min_value=0, max_value=n - 1))
    assert _run(det, errs, vals, split) == _run(det, errs, vals)


@settings(max_examples=25, deadline=None)
@given(sig=st.lists(st.integers(min_value=-32767, max_value=32767),
                    min_size=8, max_size=512),
       codec=st.sampled_from(["mulaw", "alaw", "pcm16"]))
def test_codec_roundtrip_passes_invariant_threshold(sig, codec):
    """decode(encode(x)) keeps SNR above the 30 dB invariant threshold for
    any int16 signal with nonzero energy (G.711 quantization error is
    bounded relative to signal level by construction)."""
    x = np.asarray(sig, dtype=np.int16)
    if not np.any(x):
        return  # silent signal: SNR undefined (-inf by fail-closed rule)
    back = audio.decode(audio.encode(x, codec), codec)
    assert back.shape == x.shape
    snr = audio.snr_db(x.astype(np.float64), back.astype(np.float64))
    assert snr >= 30.0 or snr == float("inf"), (codec, snr)
