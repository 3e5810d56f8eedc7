"""Streaming embedding admission into the PERSISTED ANN index.

The embedding twin of ``stream_admit.py``: every micro-batch of new
vectors is admitted into the durable ``AnnIndex`` inverted file
(``AnnIndex.admit`` — one narrow codegen projection against the persisted
centroid literal, O(increment) per epoch, the base table untouched), so a
search issued after any epoch sees everything ever streamed.  This is the
reference's persistent-pool semantics (its pools survive the stream,
/root/reference/utils/StreamProcessor.py:57) applied to the embedding
side.

Exactly-once index growth under foreachBatch's at-least-once replay
contract — the single-table specialization of the stream_admit protocol:

1. an epoch already in the manifest returns immediately (O(1) stat);
2. otherwise a PENDING sidecar carrying the cells table's current tip is
   committed BEFORE the append; a crash between append and manifest row
   leaves the pending record, and the next invocation rolls the table
   back to the recorded tip before re-admitting;
3. a pending record whose epoch IS manifested means the crash fell
   between manifest commit and pending-clear — recovery just clears it.

The quantizer is NOT fitted here: ``AnnIndex.build`` fits it exactly once
(re-fitting on admit would silently re-home history — the build()
refusal), so the gate requires an already-built root and raises loudly
otherwise.  Vector-id dedup is deliberately NOT this gate's job: identity
admission belongs to the document-level gate upstream
(``stream_admit.AdmissionGate``); this gate guarantees no DOUBLE-INSERT
on epoch replay, which is the failure mode foreachBatch actually has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.similarity import AnnIndex
from ..sources.tableio import ParquetTableIO
from .stream_admit import run_tag_for

ANN_ADMIT_SCOPE = "ann_admit_epochs"
ANN_PENDING_SCOPE = "ann_admit_pending"


class AnnAdmissionGate:
    """The foreachBatch handler, a named class so batch tests can drive
    it directly with static DataFrames (epoch replay / crash recovery
    are plain method calls, no stream machinery needed)."""

    def __init__(self, idx: AnnIndex, out_dir: str, run_tag: str = ""):
        self.idx = idx
        self.io = idx.io
        self.out_dir = out_dir
        # same scoping rule as AdmissionGate: epoch ids are only unique
        # within one checkpoint, so the replay-guard scopes carry a
        # checkpoint-derived tag
        suf = f"-{run_tag}" if run_tag else ""
        self.admit_scope = ANN_ADMIT_SCOPE + suf
        self.pending_scope = ANN_PENDING_SCOPE + suf

    def _tip(self) -> str:
        return self.io.snapshots(self.idx.CELLS)[-1]["snap"]

    def recover(self) -> bool:
        """Undo a half-committed previous attempt (module docstring rule
        2/3).  Returns True if a rollback happened."""
        pend = self.io.read_state(self.pending_scope)
        if not pend:
            return False
        rolled = False
        if not self.io.has_manifest_row(self.admit_scope, pend["epoch"]):
            if self._tip() != pend["tip"]:
                self.io.rollback(self.idx.CELLS, pend["tip"])
                rolled = True
        self.io.clear_state(self.pending_scope)
        return rolled

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        if self.io.has_manifest_row(self.admit_scope, e):
            return                  # replay of a completed epoch
        self.recover()
        # intent record FIRST: the admit append below is rollback-covered
        # until the manifest row lands
        self.io.commit_state(self.pending_scope,
                             {"epoch": e, "tip": self._tip()})
        token = self.idx.admit(batch)
        (batch.select(F.col(self.idx.id_col).alias("vec_id"))
         .withColumn("epoch", F.lit(e))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("epoch")
         .parquet(self.out_dir))    # idempotent inspection sink
        self.io.commit_manifest_row(self.admit_scope, e, token)
        self.io.clear_state(self.pending_scope)


def ann_admission_stream(spark: SparkSession, vecs_dir: str, schema,
                         out_dir: str, checkpoint_dir: str,
                         index_root: str, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_files_per_trigger: int = 1,
                         available_now: bool = True):
    """Wire a file-source embedding feed through the persisted-index
    admission gate.  The root must already be built (quantizer fitted
    once, offline) — raises loudly otherwise instead of silently
    fitting a quantizer from the first micro-batch."""
    io = ParquetTableIO(index_root)
    idx = AnnIndex(io, id_col=id_col, vec_col=vec_col)
    if io.read_state(AnnIndex.STATE) is None:
        raise ValueError(
            f"AnnIndex root {index_root!r} has no fitted quantizer: "
            "build the index once (AnnIndex.build / jobs/ann.py --build) "
            "before streaming admissions into it — fitting from the "
            "first micro-batch would make the cell layout an accident "
            "of arrival order")
    if not io.snapshots(AnnIndex.CELLS):
        # state committed but no cells snapshot: a build that crashed
        # between commit_state and its first admit.  Refuse HERE with the
        # remedy, instead of dying later inside the gate's _tip() with a
        # bare IndexError mid-stream.  (build() only refuses roots whose
        # CELLS table has commits, so re-running it is safe.)
        raise ValueError(
            f"AnnIndex root {index_root!r} has a fitted quantizer but no "
            "cells commit — a prior build crashed before indexing. "
            "Re-run the build (it will re-commit state and index the "
            "corpus), then start the stream.")
    dtypes = dict(spark.createDataFrame([], schema).dtypes)
    if id_col not in dtypes or vec_col not in dtypes:
        raise ValueError(
            f"stream schema must carry both {id_col!r} and {vec_col!r}; "
            f"got columns {sorted(dtypes)}")
    gate = AnnAdmissionGate(idx, out_dir,
                            run_tag=run_tag_for(checkpoint_dir))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(vecs_dir))
    writer = (stream.writeStream.foreachBatch(gate)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
