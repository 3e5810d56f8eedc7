"""Stateful sequential drift detection over Structured Streaming.

The batch runner (plans/runner.py) owns partition-ordered detector state for
the resumable batch path; THIS module is the continuous variant the brief's
streaming bullet asks for: ``applyInPandasWithState`` carries each stream's
``PrequentialStepper`` suite across micro-batches in Spark's checkpointed
state store, so an unbounded stream of (stream_id, seq, value, err) samples
is monitored with EXACTLY the same detector semantics as the batch kernel
(operators/detectors/kernels.py) — parity is asserted in tests by replaying
the same series through both paths.

Semantics and scale notes:
- groupBy(stream_id): each stream's state lives on one executor, keyed by
  the state store; parallelism = number of independent streams (a "stream"
  at production scale is a per-check metric series, not raw rows —
  SURVEY §7.3).
- The kernel sorts each micro-batch's rows by seq; CROSS-batch order is the
  source's responsibility (the reference stream is a replayable ordered
  series with no event time or late data — SURVEY §2.9 — so an ordered
  file/log source per stream is the contract; a ``last_seq`` guard in the
  state makes violations fail loud instead of silently corrupting detector
  state).
- State is the same pickle the batch manifest checkpoints
  (PrequentialStepper.serialize), so a stream can be seeded FROM a batch
  manifest checkpoint and vice versa.
- Output mode is append: one row per (sample, detector) past the seed
  prefix, exactly like the batch kernel. The state store checkpoint makes
  state updates effectively-once across restarts.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BinaryType, LongType, StructField, StructType)

from ..operators.detectors import config as det_config
from ..operators.detectors.harness import PrequentialStepper
from ..operators.detectors.kernels import RESULT_SCHEMA

#: per-stream state: pickled {detector_name: stepper_blob} + last seq seen
STATE_SCHEMA = StructType([
    StructField("blobs", BinaryType()),
    StructField("last_seq", LongType()),
])


def detect_stream(samples, detectors=None, tamanho_batch: int = 50):
    """``samples``: a STREAMING DataFrame with columns
    (stream_id string, seq long, value double, err double).
    Returns the streaming result DataFrame (append mode): one row per
    (sample, detector) with flag/warning/state, identical to the batch
    kernel's output for the same ordered series."""
    names = list(detectors) if detectors else list(det_config.DETECTOR_SUITE)
    suite = {n: det_config.suite_kwargs(n) for n in names}

    def step_group(key: Tuple[Any], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
        sid = key[0]
        if state.exists:
            blobs_pickle, last_seq = state.get
            steppers = {
                n: PrequentialStepper.deserialize(b)
                for n, b in pickle.loads(blobs_pickle).items()}
        else:
            last_seq = -1
            steppers = {}
        for n, kw in suite.items():
            if n not in steppers:
                steppers[n] = PrequentialStepper(
                    n, tamanho_batch, kw["params"], kw["bin_threshold"])

        # one micro-batch's rows for this group may arrive as SEVERAL
        # Arrow chunks in shuffle (not seq) order — gather them all, then
        # sort ONCE: ordering is only guaranteed across micro-batches (the
        # source contract), never across chunks within one
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0]).sort_values("seq")
            seq = pdf["seq"].to_numpy()
            if seq[0] <= last_seq:
                raise RuntimeError(
                    f"out-of-order micro-batch for stream {sid}: seq "
                    f"{seq[0]} after {last_seq} — the source must deliver "
                    f"each stream's samples in seq order")
            err = pdf["err"].to_numpy(dtype="float64")
            val = pdf["value"].to_numpy(dtype="float64")
            out = []
            for n, stepper in steppers.items():
                rows = {"seq": [], "flag": [], "warning": [], "state": []}
                for i in range(len(err)):
                    f, w, s = stepper.step(float(err[i]), float(val[i]))
                    if s != "SEED":
                        rows["seq"].append(int(seq[i]))
                        rows["flag"].append(bool(f))
                        rows["warning"].append(bool(w))
                        rows["state"].append(s)
                if rows["seq"]:
                    out.append(pd.DataFrame({
                        "stream_id": sid, "seq": rows["seq"],
                        "detector": n, "flag": rows["flag"],
                        "warning": rows["warning"],
                        "state": rows["state"]}))
            last_seq = int(seq[-1])
            if out:
                yield pd.concat(out, ignore_index=True)

        state.update((pickle.dumps(
            {n: s.serialize() for n, s in steppers.items()}), last_seq))

    return (samples.select("stream_id", "seq", "value", "err")
            .groupBy("stream_id")
            .applyInPandasWithState(
                step_group, RESULT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


def run_detect_stream(spark, samples_dir: str, schema, out_dir: str,
                      checkpoint_dir: str, detectors=None,
                      max_files_per_trigger: int = 1,
                      available_now: bool = True):
    """File-source wiring: new sample files landing in ``samples_dir``
    (each file = the next seq-ordered chunk of every stream) flow through
    the stateful detector suite into a parquet sink.  availableNow drains
    the backlog and stops (replay/test mode)."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(samples_dir))
    res = detect_stream(stream, detectors=detectors)
    writer = (res.writeStream.outputMode("append")
              .option("checkpointLocation", checkpoint_dir)
              .format("parquet").option("path", out_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
