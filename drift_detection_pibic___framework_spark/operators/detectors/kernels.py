"""Spark kernels for the sequential drift detectors.

The reference's per-sample loop (/root/reference/utils/StreamProcessor.py:186)
is inherently serial PER STREAM; Spark-side parallelism comes from many
independent streams (one per check-series / per stream_id), not from within a
stream (SURVEY §7.3).  Each stream's ordered series is processed by ONE
Arrow-batched ``applyInPandas`` group kernel:

- groupBy(stream_id) shuffles each stream's rows to a single task;
- the kernel SORTS by seq inside the group — Spark does not guarantee
  intra-group order, and order is semantic here (SURVEY §4: "sort inside the
  kernel, never rely on shuffle order");
- every detector in the suite runs over the same sorted arrays in one pass
  (one scan, no per-detector shuffle);
- the loop drives the SAME ``PrequentialStepper`` the numpy oracle uses, so
  Spark flags == oracle flags by construction (asserted in tests).

Scale notes: a "stream" at production scale is the per-partition metric
series of one check (one value per Iceberg partition — thousands of rows,
not billions); the heavy lifting (reducing 10^12 clips to those series) is
done by the batch aggregations.  State is pickled per (stream, detector)
for manifest checkpointing, so an incremental run resumes mid-stream.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import config as det_config
from .harness import PrequentialStepper

RESULT_SCHEMA = ("stream_id string, seq long, detector string, "
                 "flag boolean, warning boolean, state string")
STATE_SCHEMA = "stream_id string, detector string, state_blob binary"


def _suite(detectors: Iterable[str] = None) -> dict:
    names = list(detectors) if detectors else list(det_config.DETECTOR_SUITE)
    return {n: det_config.suite_kwargs(n) for n in names}


def detect(df: DataFrame, detectors: Iterable[str] = None,
           tamanho_batch: int = 50,
           initial_states: dict = None) -> DataFrame:
    """Run the detector suite over every stream in ``df``.

    df columns: (stream_id string, seq long, value double, err double).
    Returns one row per (sample, detector) past the seed prefix.

    ``initial_states``: {(stream_id, detector): pickled stepper} to resume
    from a manifest checkpoint; rows in df must then start at the seq AFTER
    the checkpointed prefix.
    """
    suite = _suite(detectors)
    states = initial_states or {}

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        sid = pdf["stream_id"].iloc[0]
        err = pdf["err"].to_numpy(dtype=np.float64)
        val = pdf["value"].to_numpy(dtype=np.float64)
        seq = pdf["seq"].to_numpy(dtype=np.int64)
        out = []
        for name, kw in suite.items():
            blob = states.get((sid, name))
            stepper = (PrequentialStepper.deserialize(blob) if blob
                       else PrequentialStepper(name, tamanho_batch,
                                               kw["params"],
                                               kw["bin_threshold"]))
            n = len(err)
            flags = np.zeros(n, dtype=bool)
            warns = np.zeros(n, dtype=bool)
            sts = np.empty(n, dtype=object)
            for i in range(n):
                f, w, s = stepper.step(float(err[i]), float(val[i]))
                flags[i], warns[i], sts[i] = f, w, s
            keep = sts != "SEED"
            out.append(pd.DataFrame({
                "stream_id": sid, "seq": seq[keep], "detector": name,
                "flag": flags[keep], "warning": warns[keep],
                "state": sts[keep]}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            columns=["stream_id", "seq", "detector", "flag", "warning",
                     "state"])

    return (df.select("stream_id", "seq", "value", "err")
            .groupBy("stream_id").applyInPandas(kernel, RESULT_SCHEMA))


def final_states(df: DataFrame, detectors: Iterable[str] = None,
                 tamanho_batch: int = 50,
                 initial_states: dict = None) -> DataFrame:
    """Advance each stream's steppers over df and emit the pickled end state
    per (stream, detector) — the manifest checkpoint payload."""
    suite = _suite(detectors)
    states = initial_states or {}

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        sid = pdf["stream_id"].iloc[0]
        err = pdf["err"].to_numpy(dtype=np.float64)
        val = pdf["value"].to_numpy(dtype=np.float64)
        rows = []
        for name, kw in suite.items():
            blob = states.get((sid, name))
            stepper = (PrequentialStepper.deserialize(blob) if blob
                       else PrequentialStepper(name, tamanho_batch,
                                               kw["params"],
                                               kw["bin_threshold"]))
            for i in range(len(err)):
                stepper.step(float(err[i]), float(val[i]))
            rows.append({"stream_id": sid, "detector": name,
                         "state_blob": stepper.serialize()})
        return pd.DataFrame(rows)

    return (df.select("stream_id", "seq", "value", "err")
            .groupBy("stream_id").applyInPandas(kernel, STATE_SCHEMA))


def detections_only(results: DataFrame) -> DataFrame:
    """Flagged samples, ordered — the drift-point log the reference keeps
    (StreamProcessor.py:63-71 'pontos_drift')."""
    return (results.filter(results.flag)
            .select("stream_id", "detector", "seq")
            .orderBy("stream_id", "detector", "seq"))
