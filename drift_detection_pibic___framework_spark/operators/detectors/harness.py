"""Prequential replay harness — the reference's evaluation-loop semantics
over a precomputed error stream (model-free; FIXTURES.md §3).

Mirrors /root/reference/avaliacao/DriftEvaluator.py:53-130
(``prequential_batch``) step by step:

  1. detector seeded with the initial training error — the abs-of-mean
     residual quirk (DriftEvaluator.py:48,76): here ``|mean(err[:batch])|``
     since the fixture's ``err`` column replaces model residuals;
  2. per-sample loop from ``tamanho_batch``: update detector with the error
     (KSWIN receives the raw value instead — StreamProcessor.py:214);
  3. binary-input detectors (DDM family) receive
     ``1 if erro > 0.05 else 0`` (DDMDetector.py:5,10-12);
  4. on drift: record index, open a collection window
     (DriftEvaluator.py:104-108);
  5. after ``tamanho_batch`` collected samples: RESET detector (fresh
     instance) and re-seed with the collection window's abs-of-mean error
     (DriftEvaluator.py:112-123).

Also provides ``run_stream`` (no reset — the passive loop of
``prequential_passivo``, DriftEvaluator.py:133-179) and the 3-state sequence
(framework_detector.py:134-147).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import oracle


def make_detector(name: str, params: dict = None) -> oracle.BaseDetector:
    cls = oracle.DETECTORS[name]
    return cls(**(params or {}))


def detector_input(name: str, err: float, value: float,
                   bin_threshold: float = oracle.DDM_THRESHOLD) -> float:
    """Input selection per reference semantics: KSWIN gets the raw value
    (StreamProcessor.py:214); binary detectors get the thresholded error
    (DDMDetector.py:10-12, default threshold 0.05); others get the raw
    error. ``bin_threshold`` is per-check config (EDDM's gap statistics
    need a rarer error event than DDM's 0.05 on continuous error streams)."""
    if name == "kswin":
        return value
    if name in oracle.BINARY_INPUT:
        return 1.0 if err > bin_threshold else 0.0
    return err


@dataclass
class StreamResult:
    detections: list = field(default_factory=list)   # absolute seq indices
    warnings: list = field(default_factory=list)
    states: list = field(default_factory=list)       # per processed sample
    flags: np.ndarray = None                          # bool per processed sample


class PrequentialStepper:
    """Resumable one-sample-at-a-time state machine implementing the
    prequential_batch semantics (seed → update → detect → collect →
    reset+re-seed).  The Spark kernel, the resume path and the oracle
    harness all drive THIS class, so flag parity holds by construction and
    mid-stream state can be pickled into the manifest
    (north_rule: "resumable from a checkpointed ... manifest")."""

    def __init__(self, name: str, tamanho_batch: int = 50,
                 params: dict = None,
                 bin_threshold: float = oracle.DDM_THRESHOLD):
        self.name = name
        self.tamanho_batch = tamanho_batch
        self.params = params or {}
        self.bin_threshold = bin_threshold
        self.det = make_detector(name, self.params)
        self.seeded = False
        self.seed_buf: list = []
        self.collecting = False
        self.collect_buf: list = []

    def step(self, err: float, value: float) -> tuple:
        """Advance one sample; returns (flag, warning, state) — or
        (False, False, 'SEED') while the initial training buffer fills
        (the first tamanho_batch samples train the model in the reference,
        DriftEvaluator.py:76-84, and produce no verdicts)."""
        if not self.seeded:
            self.seed_buf.append(err)
            if len(self.seed_buf) >= self.tamanho_batch:
                seed = abs(float(np.mean(self.seed_buf)))  # abs-of-mean quirk
                self.det.update(detector_input(self.name, seed, seed,
                                               self.bin_threshold))
                self.seeded = True
                self.seed_buf = []
            return False, False, "SEED"
        self.det.update(detector_input(self.name, err, value,
                                       self.bin_threshold))
        flag = self.det.drift_detected
        warning = self.det.warning_detected
        state = self.det.state()
        if flag:
            self.collecting = True
            self.collect_buf = []
        if self.collecting:
            self.collect_buf.append(err)
            if len(self.collect_buf) >= self.tamanho_batch:
                self.collecting = False
                self.det = make_detector(self.name, self.params)
                seed = abs(float(np.mean(self.collect_buf)))
                self.det.update(detector_input(self.name, seed, seed,
                                               self.bin_threshold))
                self.collect_buf = []
        return flag, warning, state

    # -- manifest serialization ------------------------------------------

    def serialize(self) -> bytes:
        import pickle
        return pickle.dumps(self)

    @staticmethod
    def deserialize(data: bytes) -> "PrequentialStepper":
        import pickle
        return pickle.loads(data)


def run_prequential(name: str, err: np.ndarray, value: np.ndarray = None,
                    tamanho_batch: int = 50, params: dict = None,
                    bin_threshold: float = oracle.DDM_THRESHOLD) -> StreamResult:
    """Active loop with detect-and-reset (prequential_batch semantics)."""
    err = np.asarray(err, dtype=np.float64)
    value = err if value is None else np.asarray(value, dtype=np.float64)
    stepper = PrequentialStepper(name, tamanho_batch, params, bin_threshold)
    res = StreamResult()
    flags = np.zeros(len(err), dtype=bool)
    for i in range(len(err)):
        flag, warning, state = stepper.step(float(err[i]), float(value[i]))
        if state == "SEED":
            continue
        if flag:
            res.detections.append(i)
            flags[i] = True
        if warning:
            res.warnings.append(i)
        res.states.append(state)
    res.flags = flags
    return res


def run_stream(name: str, err: np.ndarray, value: np.ndarray = None,
               params: dict = None,
               bin_threshold: float = oracle.DDM_THRESHOLD) -> StreamResult:
    """Passive loop: every sample through one detector instance, no external
    reset (detectors still self-reset on drift, river-style)."""
    err = np.asarray(err, dtype=np.float64)
    value = err if value is None else np.asarray(value, dtype=np.float64)
    det = make_detector(name, params)
    res = StreamResult()
    flags = np.zeros(len(err), dtype=bool)
    for i in range(len(err)):
        det.update(detector_input(name, err[i], value[i], bin_threshold))
        if det.drift_detected:
            res.detections.append(i)
            flags[i] = True
        if det.warning_detected:
            res.warnings.append(i)
        res.states.append(det.state())
    res.flags = flags
    return res
