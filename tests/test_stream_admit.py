"""Streaming admission via the persisted DedupIndex (VERDICT r4 ask #6):
batch/stream admission parity, exactly-once replay, half-commit crash
recovery, and checkpoint kill/resume."""

import os

import pytest

from drift_detection_pibic___framework_spark.operators.dedup import (
    DedupIndex)
from drift_detection_pibic___framework_spark.sources.tableio import (
    ParquetTableIO)
from drift_detection_pibic___framework_spark.streaming.stream_admit import (
    ADMIT_SCOPE, ADMITTED_TABLE, PENDING_SCOPE, AdmissionGate,
    admission_stream, ensure_admission_tables, run_tag_for)

SCHEMA = "doc_id long, text string"
# LSH knobs sized for tiny fixtures: 16 hashes / 8 bands -> 2 rows per
# band, so moderate Jaccard still collides somewhere
KN = dict(num_hashes=16, bands=8, k=3)

SEED = [
    (1, "alpha bravo charlie delta echo foxtrot golf hotel india"),
    (2, "one two three four five six seven eight nine ten"),
    (3, "the quick brown fox jumps over the lazy dog today"),
]
# increment: 9 docs in 3 arrival files (ids ascending with arrival, so
# stream epoch order == batch min-id canonical order)
FILES = [
    [(10, "alpha bravo charlie delta echo foxtrot golf hotel india"),
     (11, "completely fresh document number eleven with its own words"),
     (12, "one two three four five six seven eight nine eleven")],
    [(13, "completely fresh document number eleven with its own words"),
     (14, "another new document that matches nothing in the corpus"),
     (15, "the quick brown fox jumps over the lazy dog today")],
    [(16, "another new document that matches nothing at all here"),
     (17, "final fresh unique content closing out the increment batch"),
     (18, "one two three four five six seven eight nine eleven")],
]
# 10 = exact dup of seed 1; 15 = exact dup of seed 3; 12 = near dup of
# seed 2 (Jaccard 7/9); 13 = exact dup of 11 (cross-epoch); 18 = exact
# dup of 12 (cross-epoch); 16 shares a 7-token prefix with 14 but sits
# at Jaccard 4/12 < 0.6 -> stays admitted (the near-miss control)


def _mkidx(tmp_path, name):
    return DedupIndex(ParquetTableIO(str(tmp_path / name)), **KN)


def _batch_admit(spark, idx):
    seed = spark.createDataFrame(SEED, SCHEMA)
    idx.build(seed)
    idx.io.append(seed, ADMITTED_TABLE)
    inc = spark.createDataFrame(sum(FILES, []), SCHEMA)
    admitted = idx.admit(inc, seed, threshold=0.6).persist()
    admitted.count()
    idx.commit(admitted)
    return sorted(r.doc_id for r in admitted.collect())


def test_stream_admission_matches_batch(spark, tmp_path):
    """Same increment -> same admitted set, one-shot batch vs 3-epoch
    stream (arrival order respects id order, so epoch-order canonical
    == min-id canonical)."""
    batch_ids = _batch_admit(spark, _mkidx(tmp_path, "b"))
    assert 11 in batch_ids and 14 in batch_ids and 17 in batch_ids
    assert {10, 12, 13, 15, 18} & set(batch_ids) == set()

    sio = ParquetTableIO(str(tmp_path / "s"))
    sidx = DedupIndex(sio, **KN)
    ensure_admission_tables(spark, sidx)
    seed = spark.createDataFrame(SEED, SCHEMA)
    sidx.build(seed)
    sio.append(seed, ADMITTED_TABLE)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i, rows in enumerate(FILES):
        (spark.createDataFrame(rows, SCHEMA).coalesce(1)
         .write.parquet(f"{feed}/f{i}"))
        # one top-level file per arrival unit
        os.system(f"mv {feed}/f{i}/part-*.parquet {feed}/arrive-{i}.parquet"
                  f" && rm -r {feed}/f{i}")
    out = str(tmp_path / "out")
    q = admission_stream(spark, feed, SCHEMA, out,
                         str(tmp_path / "ckpt"),
                         str(tmp_path / "s"), threshold=0.6, **KN)
    q.awaitTermination(120)
    stream_ids = sorted(r.doc_id for r in
                        spark.read.parquet(out).collect())
    assert stream_ids == batch_ids
    # index state converged too: same digest sets on both roots
    bio = ParquetTableIO(str(tmp_path / "b"))
    bd = {r.digest for r in
          bio.read_appended(spark, DedupIndex.DIGESTS).collect()}
    sd = {r.digest for r in
          sio.read_appended(spark, DedupIndex.DIGESTS).collect()}
    assert bd == sd
    # exactly one manifest row per epoch, all three tables committed
    # (the stream scopes its replay guard by checkpoint identity)
    scope = f"{ADMIT_SCOPE}-{run_tag_for(str(tmp_path / 'ckpt'))}"
    assert sorted(sio.read_manifest(scope)) == [0, 1, 2]


def _gate(spark, tmp_path, name="g"):
    io = ParquetTableIO(str(tmp_path / name))
    idx = DedupIndex(io, **KN)
    ensure_admission_tables(spark, idx)
    seed = spark.createDataFrame(SEED, SCHEMA)
    idx.build(seed)
    io.append(seed, ADMITTED_TABLE)
    return AdmissionGate(idx, str(tmp_path / f"{name}_out"), threshold=0.6)


def test_replayed_epoch_is_noop(spark, tmp_path):
    """foreachBatch at-least-once: a replay of a manifested epoch must
    not grow the index or the admitted table."""
    gate = _gate(spark, tmp_path)
    b0 = spark.createDataFrame(FILES[0], SCHEMA)
    gate(b0, 0)
    snaps = {t: [e["snap"] for e in gate.io.snapshots(t)]
             for t in gate._tables()}
    gate(b0, 0)                                 # replay
    assert {t: [e["snap"] for e in gate.io.snapshots(t)]
            for t in gate._tables()} == snaps
    admitted = sorted(r.doc_id for r in gate.io.read_appended(
        spark, ADMITTED_TABLE).collect())
    assert admitted == [1, 2, 3, 11]            # 10/12 dropped vs seed


def test_half_commit_crash_recovers_exactly_once(spark, tmp_path):
    """Crash between the first table write and the manifest row: the
    pending record must roll the half-commit back, and the retried epoch
    must land exactly once (no duplicate admitted rows or index keys)."""
    gate = _gate(spark, tmp_path)
    b0 = spark.createDataFrame(FILES[0], SCHEMA)
    # simulate: intent recorded, admitted-table write landed, index
    # writes and manifest row never happened
    gate.io.commit_state(PENDING_SCOPE, {"epoch": 0, "tips": gate._tips()})
    gate.io.append(b0, ADMITTED_TABLE)          # poisoned partial write
    gate(b0, 0)                                 # retry
    admitted = sorted(r.doc_id for r in gate.io.read_appended(
        spark, ADMITTED_TABLE).collect())
    assert admitted == [1, 2, 3, 11]            # partial write rolled back
    assert gate.io.read_state(PENDING_SCOPE) is None
    assert 0 in gate.io.read_manifest(ADMIT_SCOPE)


def test_pending_after_manifest_never_rolls_back(spark, tmp_path):
    """Crash between manifest commit and pending-clear: recovery must
    KEEP the manifested commits (rule 3) and only clear the record."""
    gate = _gate(spark, tmp_path)
    b0 = spark.createDataFrame(FILES[0], SCHEMA)
    tips_before = gate._tips()
    gate(b0, 0)
    # re-plant the pending record as if the clear never ran
    gate.io.commit_state(PENDING_SCOPE, {"epoch": 0, "tips": tips_before})
    assert gate.recover() is False
    admitted = sorted(r.doc_id for r in gate.io.read_appended(
        spark, ADMITTED_TABLE).collect())
    assert admitted == [1, 2, 3, 11]


def test_checkpoint_kill_resume(spark, tmp_path):
    """Drain file 0, stop the query, drop the remaining files in, restart
    on the SAME checkpoint: already-processed epochs replay as no-ops and
    the final admitted set equals the single-run result."""
    sio = ParquetTableIO(str(tmp_path / "s"))
    sidx = DedupIndex(sio, **KN)
    ensure_admission_tables(spark, sidx)
    seed = spark.createDataFrame(SEED, SCHEMA)
    sidx.build(seed)
    sio.append(seed, ADMITTED_TABLE)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)

    def drop(i):
        (spark.createDataFrame(FILES[i], SCHEMA).coalesce(1)
         .write.parquet(f"{feed}/f{i}"))
        os.system(f"mv {feed}/f{i}/part-*.parquet {feed}/arrive-{i}.parquet"
                  f" && rm -r {feed}/f{i}")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    drop(0)
    q = admission_stream(spark, feed, SCHEMA, out, ckpt,
                         str(tmp_path / "s"), threshold=0.6, **KN)
    q.awaitTermination(120)
    drop(1)
    drop(2)
    q = admission_stream(spark, feed, SCHEMA, out, ckpt,
                         str(tmp_path / "s"), threshold=0.6, **KN)
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == [11, 14, 16, 17]
    # no epoch double-committed across the restart (same checkpoint ->
    # same replay-guard scope)
    m = sio.read_manifest(f"{ADMIT_SCOPE}-{run_tag_for(ckpt)}")
    assert len(m) == len(set(m)) == 3


def test_bootstrap_survives_crash_between_index_tables(spark, tmp_path):
    """A crash between the bootstrap's DIGESTS and BANDS appends (the
    bootstrap predates the pending-record protocol) must not wedge the
    gate: the next ensure_admission_tables completes the missing tables
    and _tips() resolves every table."""
    io = ParquetTableIO(str(tmp_path / "w"))
    idx = DedupIndex(io, **KN)
    # simulate the torn bootstrap: DIGESTS landed, BANDS never did
    io.append(spark.createDataFrame([], "digest string"), idx.DIGESTS)
    assert io.has_appended(idx.DIGESTS) and not io.has_appended(idx.BANDS)
    ensure_admission_tables(spark, idx)
    gate = AdmissionGate(idx, str(tmp_path / "w_out"), threshold=0.6)
    assert set(gate._tips()) == set(gate._tables())  # no IndexError
    gate(spark.createDataFrame(FILES[0], SCHEMA), 0)
    got = sorted(r.doc_id for r in io.read_appended(
        spark, ADMITTED_TABLE).collect())
    assert got == [10, 11, 12]          # empty corpus: whole batch admits


def test_index_seeded_outside_gate_raises(spark, tmp_path):
    """An index seeded via DedupIndex.build alone (keys without text)
    would silently pass near-duplicates (the verify join reads candidate
    text from ADMITTED_TABLE) — the gate must refuse to start on it."""
    import pytest
    io = ParquetTableIO(str(tmp_path / "x"))
    idx = DedupIndex(io, **KN)
    idx.build(spark.createDataFrame(SEED, SCHEMA))
    with pytest.raises(ValueError, match="seeded outside the gate"):
        ensure_admission_tables(spark, idx)


def test_seed_admission_preserves_near_dup_verification(spark, tmp_path):
    """seed_admission (the supported pre-existing-corpus path) keeps the
    text invariant, so a NEAR duplicate of a seeded doc is dropped —
    the failure mode of keys-only seeding was exactly this row passing."""
    from drift_detection_pibic___framework_spark.streaming.stream_admit import (
        seed_admission)
    io = ParquetTableIO(str(tmp_path / "y"))
    idx = DedupIndex(io, **KN)
    seed_admission(spark, idx, spark.createDataFrame(SEED, SCHEMA))
    gate = AdmissionGate(idx, str(tmp_path / "y_out"), threshold=0.6)
    gate(spark.createDataFrame(FILES[0], SCHEMA), 0)
    admitted = sorted(r.doc_id for r in io.read_appended(
        spark, ADMITTED_TABLE).collect())
    # 10 = exact dup of seed 1, 12 = NEAR dup of seed 2 (Jaccard 7/9)
    assert admitted == [1, 2, 3, 11]


def test_admission_supports_string_ids(spark, tmp_path):
    """The bootstrap schema derives the id type from the caller (r5
    review: a hardcoded 'long' bootstrap type-conflicted with every
    later append of a string-id stream, wedging all reads)."""
    from drift_detection_pibic___framework_spark.streaming.stream_admit import (
        seed_admission)
    idx = DedupIndex(ParquetTableIO(str(tmp_path / "sidx")),
                     id_col="doc_id", **KN)
    schema_s = "doc_id string, text string"
    corpus = spark.createDataFrame(
        [(f"d{i}", t) for i, t in SEED], schema_s)
    seed_admission(spark, idx, corpus)
    gate = AdmissionGate(idx, str(tmp_path / "sout"), threshold=0.6)
    batch = spark.createDataFrame(
        [("n1", SEED[0][1]),                       # exact dup of d1
         ("n2", "totally fresh words that match nothing in the corpus")],
        schema_s)
    gate(batch, 0)
    got = sorted(r.doc_id for r in spark.read.parquet(
        str(tmp_path / "sout")).collect())
    assert got == ["n2"]
    # a later run with a mismatched id type fails loudly at start
    with pytest.raises(ValueError, match="bootstrapped"):
        ensure_admission_tables(spark, idx, id_type="long")


def test_replay_guard_is_checkpoint_scoped(spark, tmp_path):
    """Epoch ids restart at 0 under a new/reset checkpoint; the replay
    guard must not discard those fresh batches (r5 review).  A second
    gate with a different run_tag processes epoch 0 again — the index
    itself rejects true duplicates, so re-processing is safe."""
    idx = _mkidx(tmp_path, "scoped")
    ensure_admission_tables(spark, idx)
    out = str(tmp_path / "scout")
    gate_a = AdmissionGate(idx, out, threshold=0.6, run_tag="ckpt-a")
    gate_a(spark.createDataFrame(FILES[0], SCHEMA), 0)
    # same epoch id, same tag -> replay, skipped
    n_before = spark.read.parquet(out).count()
    gate_a(spark.createDataFrame(FILES[1], SCHEMA), 0)
    assert spark.read.parquet(out).count() == n_before
    # same epoch id, NEW tag (reset checkpoint) -> processed: fresh docs
    # 14/15 are admitted, 13 is rejected against gate_a's admitted 11 —
    # the index, not the replay guard, provides cross-run idempotency
    gate_b = AdmissionGate(idx, out, threshold=0.6, run_tag="ckpt-b")
    gate_b(spark.createDataFrame(FILES[1], SCHEMA), 0)
    got = sorted(r.doc_id for r in idx.io.read_appended(
        spark, ADMITTED_TABLE).collect())
    assert got == [10, 11, 12, 14, 15]


def test_seed_admission_crash_safe_and_one_shot(spark, tmp_path,
                                                monkeypatch):
    """A seed that dies between the text append and the key build must
    roll back on the next call (text without keys would wave every
    duplicate of the seeded corpus through); a root with admitted docs
    refuses a re-seed (r5 review)."""
    from drift_detection_pibic___framework_spark.streaming.stream_admit import (
        seed_admission)
    idx = _mkidx(tmp_path, "seedcrash")
    corpus = spark.createDataFrame(SEED, SCHEMA)

    def boom(self, rows):
        raise RuntimeError("simulated crash before key build")

    monkeypatch.setattr(DedupIndex, "build", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        seed_admission(spark, idx, corpus)
    monkeypatch.undo()
    seed_admission(spark, idx, corpus)      # recovers, then seeds once
    got = sorted(r.doc_id for r in idx.io.read_appended(
        spark, ADMITTED_TABLE).collect())
    assert got == [1, 2, 3]                 # exactly ONE copy of the corpus
    digs = idx.io.read_appended(spark, idx.DIGESTS).count()
    assert digs == 3                        # keys present
    with pytest.raises(ValueError, match="one-shot"):
        seed_admission(spark, idx, corpus)
