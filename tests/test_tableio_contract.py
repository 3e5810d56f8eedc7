"""TableIO backend conformance contract (VERDICT r4 ask #4).

The engine talks to storage only through the TableIO seam; every clause
below is a guarantee some engine component RELIES on (named per test).
``TableIOContract`` encodes the contract once; each backend subclasses it
and provides the two hooks.  ParquetTableIO (the offline backend) runs
now; an Iceberg-backed implementation must pass the SAME class unchanged
— ``TestIcebergBackend`` is wired and auto-skips until an Iceberg runtime
jar + catalog are on the session (SURVEY §7.1).

Backend checklist — the Iceberg primitive that must implement each clause
(retires the §7.1 "semantics only exercised on parquet" risk by test):

  C1  append visibility/order    -> snapshot commit (atomic metadata swap)
  C2  time travel by snapshot    -> VERSION AS OF / snapshot-id read
  C3  rollback hides suffix      -> rollback_to_snapshot procedure
  C4  append after rollback      -> normal commit on the rolled-back tip
  C5  upsert replaces by key     -> MERGE INTO / v2 equality deletes
  C6  delete hides earlier rows  -> v2 equality-delete file
  C7  marker ordering (own rows
      survive own marker; later
      append re-inserts)         -> sequence-number semantics
  C8  expire keeps recent travel -> expire_snapshots(retain_last=k)
  C9  compact applies markers    -> rewrite_data_files + expire
  C10 rewrite replaces contents  -> overwrite snapshot
  C11 vacuum never changes reads -> remove_orphan_files
  C12 stats sidecars fold-only   -> per-commit column metrics (extended:
                                    moments/KLL/MG/HLL puffin-style blobs)
  C13 manifest rows + resume     -> external run-state table (engine-owned
                                    either way; kept in the seam so one
                                    object carries the whole contract)
  C14 state sidecar round-trip   -> same
  C15 partition listing/pruning  -> table.partitions metadata read
  C16 read_where == filter       -> manifest min/max file pruning; the
                                    residual filter ALWAYS re-applies, so
                                    a backend with no plan_where stays
                                    correct (conservative scan)

Reliance points: plans/runner.py (resume, manifest, state sidecar),
operators/snapshot_diff.py (sidecar folds), operators/dedup.DedupIndex and
operators/similarity.AnnIndex (append/upsert/rollback), jobs/maintain.py
(expire/compact/vacuum), sources/tableio.read_where (pruned scans).
"""

import os

import pytest

from drift_detection_pibic___framework_spark.sources.tableio import (
    ParquetTableIO)


def _ids(spark, io, name, as_of=None):
    return sorted(r.id for r in
                  io.read_appended(spark, name, as_of=as_of).collect())


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 10 AS v")


class TableIOContract:
    """Backend-neutral contract.  Subclasses provide ``io`` (a fresh
    TableIO rooted in an empty location) and ``make_partitioned`` (create
    a partitioned data table with the given part -> rows mapping)."""

    @pytest.fixture()
    def io(self, tmp_path):
        raise NotImplementedError

    def make_partitioned(self, spark, io, name: str, parts: dict) -> None:
        raise NotImplementedError

    # -- C1/C2: commit visibility, ordering, time travel ------------------

    def test_c1_append_visibility_and_order(self, spark, io):
        """DedupIndex/AnnIndex admit() assumes each append is immediately
        and exactly visible, and that snapshots() orders by commit."""
        assert not io.has_appended("t")
        s1 = io.append(_df(spark, 0, 3), "t")
        s2 = io.append(_df(spark, 3, 5), "t")
        assert s1 != s2
        assert [e["snap"] for e in io.snapshots("t")] == [s1, s2]
        assert _ids(spark, io, "t") == list(range(5))
        assert io.has_appended("t")

    def test_c2_time_travel_prefix(self, spark, io):
        s1 = io.append(_df(spark, 0, 3), "t")
        io.append(_df(spark, 3, 5), "t")
        assert _ids(spark, io, "t", as_of=s1) == [0, 1, 2]
        with pytest.raises(ValueError, match="unknown snapshot"):
            io.read_appended(spark, "t", as_of="nope")

    # -- C3/C4: rollback ---------------------------------------------------

    def test_c3_c4_rollback_hides_suffix_then_append(self, spark, io):
        """DedupIndex.rollback(): a failed incremental-admit batch must
        disappear from every index table, and the next admit must commit
        cleanly on the rolled-back tip."""
        s1 = io.append(_df(spark, 0, 3), "t")
        io.append(_df(spark, 3, 5), "t")
        assert io.rollback("t", s1) == 1
        assert _ids(spark, io, "t") == [0, 1, 2]
        assert [e["snap"] for e in io.snapshots("t")] == [s1]
        s3 = io.append(_df(spark, 10, 12), "t")
        assert [e["snap"] for e in io.snapshots("t")] == [s1, s3]
        assert _ids(spark, io, "t") == [0, 1, 2, 10, 11]

    # -- C5..C7: merge-on-read marker semantics ----------------------------

    def test_c5_upsert_replaces_by_key(self, spark, io):
        """events_upsert_user_state / runner verdict overwrite path."""
        io.append(_df(spark, 0, 4), "t")
        io.upsert(spark.range(2, 6).selectExpr("id", "id * 100 AS v"),
                  "t", key="id")
        rows = {r.id: r.v for r in io.read_appended(spark, "t").collect()}
        assert rows == {0: 0, 1: 10, 2: 200, 3: 300, 4: 400, 5: 500}

    def test_c6_delete_hides_earlier_rows_only(self, spark, io):
        io.append(_df(spark, 0, 4), "t")
        io.delete_keys(spark.range(1, 3).selectExpr("id"), "t", key="id")
        assert _ids(spark, io, "t") == [0, 3]
        # C7: a LATER plain append re-inserts a deleted key
        io.append(_df(spark, 2, 3), "t")
        assert _ids(spark, io, "t") == [0, 2, 3]

    def test_c7_upsert_own_rows_survive_own_marker(self, spark, io):
        io.append(_df(spark, 0, 2), "t")
        io.upsert(_df(spark, 0, 2), "t", key="id")
        assert _ids(spark, io, "t") == [0, 1]

    # -- C8..C11: maintenance never changes current reads -------------------

    def test_c8_expire_keeps_recent_time_travel(self, spark, io):
        snaps = [io.append(_df(spark, i, i + 2), "t") for i in range(0, 8, 2)]
        before = _ids(spark, io, "t")
        assert io.expire_snapshots(spark, "t", keep_last=2) == 2
        assert _ids(spark, io, "t") == before
        # the kept suffix still time-travels
        assert _ids(spark, io, "t", as_of=snaps[2]) == list(range(6))
        # folded commits are no longer addressable
        with pytest.raises(ValueError, match="unknown snapshot"):
            io.read_appended(spark, "t", as_of=snaps[0])

    def test_c9_compact_applies_markers(self, spark, io):
        io.append(_df(spark, 0, 4), "t")
        io.delete_keys(spark.range(1, 2).selectExpr("id"), "t", key="id")
        before = _ids(spark, io, "t")
        io.compact_snapshots(spark, "t")
        assert _ids(spark, io, "t") == before == [0, 2, 3]
        assert [e.get("kind") for e in io.snapshots("t")] == ["rewrite"]

    def test_c10_rewrite_replaces_contents(self, spark, io):
        io.append(_df(spark, 0, 4), "t")
        io.rewrite(_df(spark, 100, 102), "t")
        assert _ids(spark, io, "t") == [100, 101]

    def test_c11_vacuum_never_changes_reads(self, spark, io):
        s1 = io.append(_df(spark, 0, 3), "t")
        io.append(_df(spark, 3, 5), "t")
        io.rollback("t", s1)
        before = _ids(spark, io, "t")
        io.vacuum("t")
        assert _ids(spark, io, "t") == before

    # -- C12: stats sidecars (zero-rescan gates) ----------------------------

    def test_c12_stats_sidecar_covers_commit(self, spark, io):
        """snapshot_diff folds sidecars ONLY — they must carry exact
        moments for the commit, and rolled-back commits must vanish from
        the fold input."""
        s1 = io.append(_df(spark, 0, 4), "t", stats_cols=["v"])
        s2 = io.append(_df(spark, 4, 6), "t", stats_cols=["v"])
        sides = io.snapshot_stats("t")
        assert [(s["snap"], s["rows"]) for s in sides] == [(s1, 4), (s2, 2)]
        assert sides[0]["cols"]["v"] == {
            "n": 4, "nulls": 0, "sum": 60, "sumsq": 1400,
            "min": 0, "max": 30}
        io.rollback("t", s1)
        assert [s["rows"] for s in io.snapshot_stats("t")] == [4]

    # -- C13/C14: run manifest + detector state sidecar ----------------------

    def test_c13_manifest_rows_and_pending(self, spark, io):
        """plans/runner.py resume: a kill between output write and manifest
        commit re-validates the partition; done rows are skipped."""
        self.make_partitioned(spark, io, "pt",
                              {0: [(0, "a")], 1: [(1, "b")], 2: [(2, "c")]})
        assert io.list_partitions("pt") == [0, 1, 2]
        io.commit_manifest_row("run1", 0, {"status": "done"})
        io.commit_manifest_row("run1", 2, {"status": "running"})
        assert io.pending_partitions("pt", "run1") == [1, 2]
        m = io.read_manifest("run1")
        assert m[0]["status"] == "done" and m[2]["status"] == "running"
        io.compact_manifest("run1")
        assert {k: v["status"] for k, v in io.read_manifest("run1").items()
                } == {0: "done", 2: "running"}

    def test_c14_state_sidecar_roundtrip(self, io):
        assert io.read_state("run1") is None
        io.commit_state("run1", {"detector": {"p": 0.25}, "seq": 7})
        assert io.read_state("run1") == {"detector": {"p": 0.25}, "seq": 7}
        io.clear_state("run1")
        assert io.read_state("run1") is None

    # -- C15/C16: partitioned reads and pruned range scans -------------------

    def test_c15_partition_read_is_exact(self, spark, io):
        self.make_partitioned(spark, io, "pt",
                              {0: [(10, "a"), (11, "b")], 3: [(30, "c")]})
        assert io.list_partitions("pt") == [0, 3]
        got = sorted(r.clip_id for r in
                     io.read_partition(spark, "pt", 3).collect())
        assert got == [30]
        assert io.read_table(spark, "pt").count() == 3

    def test_c16_read_where_equals_filter(self, spark, io):
        """Pruning is an optimization, never a semantics change: read_where
        must equal the full-scan filter on every backend, with or without
        selective file stats."""
        io.write_clustered(_df(spark, 0, 1000), "t", by=["v"], n_files=8)
        pruned = _ids_of(io.read_where(spark, "t", {"v": (2500, 4990)}))
        full = _ids_of(io.read_appended(spark, "t")
                       .filter("v >= 2500 and v <= 4990"))
        assert pruned == full and len(full) == 250
        # with stats present, the plan must touch fewer files than the table
        paths, report = io.plan_where("t", {"v": (2500, 4990)})
        if paths is not None:
            assert 0 < report["files_kept"] < report["files_total"]


def _ids_of(df):
    return sorted(r.id for r in df.collect())


class TestParquetBackend(TableIOContract):
    """The offline backend the engine ships with."""

    @pytest.fixture()
    def io(self, tmp_path):
        return ParquetTableIO(str(tmp_path))

    def make_partitioned(self, spark, io, name, parts):
        import pyarrow as pa
        import pyarrow.parquet as pq
        d = os.path.join(io.root, name)
        os.makedirs(d, exist_ok=True)
        for p, rows in parts.items():
            t = pa.table({"clip_id": pa.array([r[0] for r in rows],
                                              pa.int64()),
                          "label": pa.array([r[1] for r in rows]),
                          "part": pa.array([p] * len(rows), pa.int32())})
            pq.write_table(t, os.path.join(d, f"part-{p:04d}.parquet"))


class TestIcebergBackend(TableIOContract):
    """Runs the SAME contract against an Iceberg catalog once one is
    available (iceberg-spark-runtime jar + spark.sql.catalog.* conf).
    Until then every clause reports a skip naming the missing piece, so
    the gap stays visible in every test run instead of living in prose."""

    @pytest.fixture()
    def io(self, spark, tmp_path):
        if not any(k.startswith("spark.sql.catalog.")
                   for k, _ in spark.sparkContext.getConf().getAll()):
            pytest.skip("no Iceberg catalog on session (runtime jar "
                        "unavailable offline — SURVEY §7.1); contract "
                        "clause awaiting an IcebergTableIO implementation")
        raise NotImplementedError(
            "wire IcebergTableIO here once the full seam is implemented "
            "against a catalog; the checklist in this module's docstring "
            "maps each clause to its Iceberg primitive")


def test_iceberg_backend_matches_seam_call_shapes():
    """The pluggable-backend premise requires identical call shapes: a
    caller written against ParquetTableIO (runner, DedupIndex, AnnIndex)
    must be able to swap in IcebergTableIO without edits.  Pins the two
    arity bugs a review found (list_partitions took an extra spark arg,
    append rejected the profiling kwargs)."""
    import inspect

    from drift_detection_pibic___framework_spark.sources.tableio import (
        IcebergTableIO)
    for meth in ("read_table", "read_partition", "list_partitions",
                 "append"):
        pq_params = list(inspect.signature(
            getattr(ParquetTableIO, meth)).parameters)
        ib_params = list(inspect.signature(
            getattr(IcebergTableIO, meth)).parameters)
        assert ib_params == pq_params, meth
