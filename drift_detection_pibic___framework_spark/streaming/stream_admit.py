"""Streaming ingest admission against the PERSISTED dedup index.

``stream_dedup.py`` owns the SHORT horizon (retry/replay duplicates
inside the watermark, bounded state-store rows).  THIS module closes the
long horizon: every micro-batch is admitted against the durable
``DedupIndex`` tables (``dedup_digests`` / ``dedup_bands``), so a
document that duplicates ANYTHING ever admitted — yesterday's crawl, a
different route, a previous stream run — is dropped at ingest.  Per
epoch the work is O(increment): the exact and LSH phases join the batch
against the persisted key tables, and previously-admitted TEXT is read
only semi-join-restricted to verify candidates (the dedup_incremental
one-scan contract).

Exactly-once index growth under foreachBatch's at-least-once replay
contract, across THREE tables with no multi-table transaction:

1. an epoch already in the manifest returns immediately (its commits
   completed — the manifest row is the commit point);
2. otherwise a PENDING state sidecar carrying every table's current tip
   is committed BEFORE the first table write; a crash anywhere between
   first write and manifest row leaves the pending record, and the next
   invocation rolls each table back to its recorded tip before
   recomputing (TableIO snapshot rollback);
3. a pending record whose epoch IS in the manifest means the crash fell
   between manifest commit and pending-clear — the commits completed, so
   recovery just clears the record (never rolls back manifested data).

The reference analogue is its persistent cross-sample pools
(/root/reference/utils/StreamProcessor.py:57): state survives the
stream instead of being rebuilt per sample.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import DedupIndex
from ..sources.tableio import ParquetTableIO

ADMITTED_TABLE = "admitted_docs"
ADMIT_SCOPE = "dedup_admit_epochs"
PENDING_SCOPE = "dedup_admit_pending"
SEED_PENDING_SCOPE = "dedup_seed_pending"


def run_tag_for(checkpoint_dir: str) -> str:
    """Deterministic replay-guard scope tag for a checkpoint location
    (epoch ids are only unique within one checkpoint — see
    AdmissionGate)."""
    return hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode()).hexdigest()[:12]


def ensure_admission_tables(spark: SparkSession, idx: DedupIndex,
                            id_type: str = "long") -> None:
    """Bootstrap the index + admitted-docs tables with one empty commit
    each, so every later tip is a real snapshot id (rollback_to targets
    always exist) and a first stream run needs no special-casing.

    ``id_type`` is the doc-id column's Spark type name — it must match
    the stream/corpus schema (``admission_stream`` derives it from the
    caller's schema): a bootstrap snapshot written with a mismatched id
    type would type-conflict with every later append, permanently
    wedging reads of the bands and admitted tables.  An ALREADY
    bootstrapped root is checked against ``id_type`` and raises loudly
    on mismatch instead of leaving the conflict to surface as a Parquet
    conversion error mid-stream.

    Each table is checked INDIVIDUALLY: ``idx.build`` appends DIGESTS
    then BANDS, and this bootstrap predates the pending-record protocol,
    so a crash between the two must not wedge the gate (an extra empty
    append to an already-bootstrapped table is harmless).

    Also enforces the gate's text invariant: every indexed doc's text
    must be servable from ADMITTED_TABLE (the near-dup verify phase reads
    candidate text there — see ``seed_admission``).  An index seeded
    directly via ``DedupIndex.build(corpus)`` without the matching text
    append would silently pass near-duplicates, so that state raises
    here, once, at stream start."""
    io = idx.io
    empty = spark.createDataFrame(
        [], f"{idx.id_col} {id_type}, {idx.col} string")
    if not (io.has_appended(idx.DIGESTS) and io.has_appended(idx.BANDS)):
        idx.build(empty)
    if not io.has_appended(ADMITTED_TABLE):
        io.append(empty, ADMITTED_TABLE)
    # compare through Spark's canonical dtype names ('long' -> 'bigint')
    expected = dict(empty.dtypes)[idx.id_col]
    existing = dict(io.read_appended(spark, ADMITTED_TABLE).dtypes).get(
        idx.id_col)
    if existing is not None and existing != expected:
        raise ValueError(
            f"admission root was bootstrapped with {idx.id_col}:{existing} "
            f"but this run's schema carries {idx.id_col}:{expected}; mixed "
            "id types in one snapshot table cannot be read back — use a "
            "fresh index_root (or the original id type)")
    has_keys = bool(io.read_appended(spark, idx.DIGESTS).take(1))
    if has_keys and not io.read_appended(spark, ADMITTED_TABLE).take(1):
        raise ValueError(
            f"admission root has indexed digests but an empty "
            f"{ADMITTED_TABLE} table: the index was seeded outside the "
            "gate, so near-duplicate verification would silently no-op. "
            "Seed a pre-existing corpus with seed_admission(spark, idx, "
            "corpus) instead of DedupIndex.build().")


def seed_admission(spark: SparkSession, idx: DedupIndex,
                   corpus: DataFrame) -> dict:
    """Seed the admission root with a PRE-EXISTING corpus: index its keys
    AND append its text to ADMITTED_TABLE in one call, preserving the
    gate's invariant that every indexed doc's text is servable for the
    near-dup verify join.  Returns the index commit token.

    Crash-safe via the same pending-record protocol as the gate: a
    pending sidecar carrying every table's tip is committed before the
    first write, so a seed that died between the text append and the key
    build is rolled back to its tips on the next call instead of leaving
    text without keys (every duplicate of the seeded corpus would then
    sail through the exact/LSH phases).  Seeding is ONE-SHOT: a root
    whose admitted table already has rows refuses a re-seed (re-appending
    corpus text would leave permanent duplicate rows) — grow an already
    live root through the gate / ``DedupIndex.admit`` instead."""
    io = idx.io
    rows = corpus.select(F.col(idx.id_col), F.col(idx.col))
    ensure_admission_tables(spark, idx, id_type=dict(rows.dtypes)[idx.id_col])
    tables = (idx.DIGESTS, idx.BANDS, ADMITTED_TABLE)
    pend = io.read_state(SEED_PENDING_SCOPE)
    if pend:                      # previous seed died mid-commit: undo it
        for t, tip in pend["tips"].items():
            if io.snapshots(t)[-1]["snap"] != tip:
                io.rollback(t, tip)
        io.clear_state(SEED_PENDING_SCOPE)
    if io.read_appended(spark, ADMITTED_TABLE).take(1):
        raise ValueError(
            "admission root already has admitted documents; seeding is "
            "one-shot on an empty root (admit further corpus through the "
            "gate or DedupIndex.admit, which dedup against it)")
    io.commit_state(SEED_PENDING_SCOPE, {
        "tips": {t: io.snapshots(t)[-1]["snap"] for t in tables}})
    io.append(rows, ADMITTED_TABLE)
    token = idx.build(rows)
    io.clear_state(SEED_PENDING_SCOPE)
    return token


class AdmissionGate:
    """The foreachBatch handler, a named class so batch tests can drive
    it directly with static DataFrames (epoch replay / crash recovery are
    plain method calls, no stream machinery needed)."""

    def __init__(self, idx: DedupIndex, out_dir: str,
                 threshold: float = 0.7, run_tag: str = ""):
        self.idx = idx
        self.io = idx.io
        self.out_dir = out_dir
        self.threshold = threshold
        # foreachBatch epoch ids are only unique WITHIN one checkpoint:
        # a reset (or second) checkpoint restarts at epoch 0, and an
        # un-scoped replay guard would silently discard its first N fresh
        # batches as "replays".  Scoping the manifest/pending names by a
        # checkpoint-derived tag keeps exactly-once within a checkpoint
        # while a new checkpoint re-processes from scratch — harmless,
        # because the index itself rejects already-admitted documents.
        suf = f"-{run_tag}" if run_tag else ""
        self.admit_scope = ADMIT_SCOPE + suf
        self.pending_scope = PENDING_SCOPE + suf

    def _tables(self):
        return (self.idx.DIGESTS, self.idx.BANDS, ADMITTED_TABLE)

    def _tips(self) -> dict:
        return {t: self.io.snapshots(t)[-1]["snap"] for t in self._tables()}

    def recover(self) -> bool:
        """Undo a half-committed previous attempt (see module docstring
        rule 2/3).  Returns True if a rollback happened."""
        pend = self.io.read_state(self.pending_scope)
        if not pend:
            return False
        rolled = False
        if not self.io.has_manifest_row(self.admit_scope, pend["epoch"]):
            for t, tip in pend["tips"].items():
                if self.io.snapshots(t)[-1]["snap"] != tip:
                    self.io.rollback(t, tip)
                    rolled = True
        self.io.clear_state(self.pending_scope)
        return rolled

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        if self.io.has_manifest_row(self.admit_scope, e):
            return      # replay of a completed epoch — O(1) stat, never
            #             a whole-manifest read per micro-batch
        self.recover()
        spark = batch.sparkSession
        corpus = self.io.read_appended(spark, ADMITTED_TABLE)
        admitted = self.idx.admit(batch, corpus,
                                  threshold=self.threshold).persist()
        admitted.count()                    # pin before the commits below
        # intent record FIRST: every commit after this line is
        # rollback-covered until the manifest row lands
        self.io.commit_state(self.pending_scope, {"epoch": e,
                                                  "tips": self._tips()})
        snap_a = self.io.append(
            admitted.select(self.idx.id_col, self.idx.col), ADMITTED_TABLE)
        token = self.idx.commit(admitted)
        (admitted.withColumn("epoch", F.lit(e))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("epoch")
         .parquet(self.out_dir))            # idempotent inspection sink
        self.io.commit_manifest_row(
            self.admit_scope, e, {"admitted": snap_a, **token})
        self.io.clear_state(self.pending_scope)
        admitted.unpersist()


def admission_stream(spark: SparkSession, docs_dir: str, schema,
                     out_dir: str, checkpoint_dir: str, index_root: str,
                     threshold: float = 0.7, num_hashes: int = 16,
                     bands: int = 8, k: int = 3,
                     id_col: str = "doc_id", col: str = "text",
                     max_files_per_trigger: int = 1,
                     available_now: bool = True):
    """Wire a file-source document feed through the persisted-index
    admission gate.  Epoch order is admission order: when duplicates
    span epochs the EARLIER arrival wins (batch dedup's min-id canonical
    rule, specialized to arrival order)."""
    io = ParquetTableIO(index_root)
    idx = DedupIndex(io, num_hashes=num_hashes, bands=bands, k=k,
                     col=col, id_col=id_col)
    dtypes = dict(spark.createDataFrame([], schema).dtypes)
    if id_col not in dtypes or col not in dtypes:
        raise ValueError(
            f"stream schema must carry both {id_col!r} and {col!r}; "
            f"got columns {sorted(dtypes)}")
    ensure_admission_tables(spark, idx, id_type=dtypes[id_col])
    gate = AdmissionGate(idx, out_dir, threshold,
                         run_tag=run_tag_for(checkpoint_dir))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(docs_dir))
    writer = (stream.writeStream.foreachBatch(gate)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
