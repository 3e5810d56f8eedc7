"""Snapshot log, time travel, rollback and vacuum on TableIO append tables
(the Iceberg metadata model at file granularity)."""

import os
import shutil

import pytest

from drift_detection_pibic___framework_spark.sources.tableio import (
    ParquetTableIO)


@pytest.fixture()
def io(tmp_path):
    return ParquetTableIO(str(tmp_path))


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 10 AS v")


def test_time_travel_reads_prefix(spark, io):
    s1 = io.append(_df(spark, 0, 3), "t")
    s2 = io.append(_df(spark, 3, 5), "t")
    s3 = io.append(_df(spark, 5, 9), "t")
    assert [e["snap"] for e in io.snapshots("t")] == [s1, s2, s3]
    assert io.read_appended(spark, "t").count() == 9
    assert sorted(r.id for r in io.read_appended(spark, "t", as_of=s2)
                  .collect()) == list(range(5))
    assert io.read_appended(spark, "t", as_of=s1).count() == 3
    with pytest.raises(ValueError, match="unknown snapshot"):
        io.read_appended(spark, "t", as_of="nope")


def test_rollback_hides_then_vacuum_deletes(spark, io):
    s1 = io.append(_df(spark, 0, 3), "t")
    s2 = io.append(_df(spark, 3, 5), "t")
    io.append(_df(spark, 5, 9), "t")
    assert io.rollback("t", s2) == 1
    # rolled-back data invisible to current reads AND as-of reads
    assert io.read_appended(spark, "t").count() == 5
    assert [e["snap"] for e in io.snapshots("t")] == [s1, s2]
    # orphan entry still listed for forensics until vacuum
    assert [e["snap"] for e in io.snapshots("t", include_orphaned=True)
            if e["orphaned"]] != []
    n_dirs_before = sum(f.startswith("snap-")
                        for f in os.listdir(f"{io.root}/t"))
    assert n_dirs_before == 3
    assert io.vacuum("t") == 1
    assert sum(f.startswith("snap-")
               for f in os.listdir(f"{io.root}/t")) == 2
    assert io.read_appended(spark, "t").count() == 5
    assert io.snapshots("t", include_orphaned=True) == io.snapshots("t")


def test_crashed_append_is_invisible(spark, io):
    s1 = io.append(_df(spark, 0, 3), "t")
    # simulate a crash mid-append: data dir written, log entry never
    # committed (the commit point is the log rename)
    src = f"{io.root}/t/snap-{s1}"
    shutil.copytree(src, f"{io.root}/t/snap-deadbeefdeadbeef")
    assert io.read_appended(spark, "t").count() == 3
    assert io.vacuum("t") == 1
    assert not os.path.isdir(f"{io.root}/t/snap-deadbeefdeadbeef")


def test_pre_log_table_bootstraps_on_append(spark, io):
    # build a legacy table: snap dirs, no _snaplog
    _df(spark, 0, 4).write.parquet(f"{io.root}/t/snap-aaaa")
    _df(spark, 4, 6).write.parquet(f"{io.root}/t/snap-bbbb")
    os.utime(f"{io.root}/t/snap-aaaa", (1000, 1000))
    os.utime(f"{io.root}/t/snap-bbbb", (2000, 2000))
    assert io.read_appended(spark, "t").count() == 6   # glob fallback
    s3 = io.append(_df(spark, 6, 7), "t")
    snaps = [e["snap"] for e in io.snapshots("t")]
    assert snaps == ["aaaa", "bbbb", s3]               # mtime order
    assert io.read_appended(spark, "t", as_of="aaaa").count() == 4
    assert io.read_appended(spark, "t").count() == 7


# -- merge-on-read equality deletes / upsert / major compaction ------------

def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k string, v int")


def test_delete_keys_hides_then_reinsert(spark, io):
    io.append(_kv(spark, [("a", 1), ("b", 2)]), "t")
    io.delete_keys(_kv(spark, [("a", 0)]), "t", "k")
    got = {r.k: r.v for r in io.read_appended(spark, "t").collect()}
    assert got == {"b": 2}
    # a later plain append re-inserts the key
    io.append(_kv(spark, [("a", 9)]), "t")
    got = {r.k: r.v for r in io.read_appended(spark, "t").collect()}
    assert got == {"a": 9, "b": 2}


def test_upsert_replaces_atomically(spark, io):
    io.append(_kv(spark, [("a", 1), ("b", 2)]), "t")
    io.upsert(_kv(spark, [("b", 20), ("c", 30)]), "t", "k")
    got = {r.k: r.v for r in io.read_appended(spark, "t").collect()}
    assert got == {"a": 1, "b": 20, "c": 30}
    # a second upsert supersedes the first's rows
    io.upsert(_kv(spark, [("b", 200)]), "t", "k")
    got = {r.k: r.v for r in io.read_appended(spark, "t").collect()}
    assert got == {"a": 1, "b": 200, "c": 30}


def test_delete_time_travel_sees_pre_delete_state(spark, io):
    s1 = io.append(_kv(spark, [("a", 1), ("b", 2)]), "t")
    io.delete_keys(_kv(spark, [("a", 0)]), "t", "k")
    assert {r.k for r in
            io.read_appended(spark, "t", as_of=s1).collect()} == {"a", "b"}
    assert {r.k for r in
            io.read_appended(spark, "t").collect()} == {"b"}


def test_rollback_of_delete_restores_rows(spark, io):
    s1 = io.append(_kv(spark, [("a", 1), ("b", 2)]), "t")
    io.delete_keys(_kv(spark, [("b", 0)]), "t", "k")
    io.rollback("t", s1)
    assert {r.k for r in
            io.read_appended(spark, "t").collect()} == {"a", "b"}


def test_plain_table_keeps_multi_path_scan(spark, io):
    io.append(_kv(spark, [("a", 1)]), "t")
    io.append(_kv(spark, [("b", 2)]), "t")
    plan = io.read_appended(spark, "t") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan          # no merge machinery without deletes


def test_compact_snapshots_applies_deletes_physically(spark, io):
    io.append(_kv(spark, [("a", 1), ("b", 2)]), "t")
    io.upsert(_kv(spark, [("b", 20)]), "t", "k")
    io.delete_keys(_kv(spark, [("a", 0)]), "t", "k")
    before = {(r.k, r.v) for r in io.read_appended(spark, "t").collect()}
    io.compact_snapshots(spark, "t")
    after = {(r.k, r.v) for r in io.read_appended(spark, "t").collect()}
    assert after == before == {("b", 20)}
    snaps = io.snapshots("t")
    assert len(snaps) == 1 and snaps[0].get("kind") == "rewrite"
    # compacted read is the plain scan again, and vacuum collects the old
    plan = io.read_appended(spark, "t") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert io.vacuum("t") == 3
    assert after == {(r.k, r.v)
                     for r in io.read_appended(spark, "t").collect()}


def test_compact_interrupted_retirement_never_doubles(spark, io, tmp_path):
    """The rewrite commit supersedes earlier entries at READ time, so even
    if retirement hadn't happened (simulated by re-committing a live entry
    file), membership restarts at the rewrite."""
    import json as J
    import os as O

    io.append(_kv(spark, [("a", 1)]), "t")
    io.compact_snapshots(spark, "t")
    # resurrect one retired entry, as an interrupted retirement would leave
    d = io._snaplog_dir("t")
    orphans = [f for f in O.listdir(d) if f.endswith(".orphan")]
    O.replace(O.path.join(d, orphans[0]),
              O.path.join(d, orphans[0][:-len(".orphan")] + ".json"))
    rows = io.read_appended(spark, "t").collect()
    assert [(r.k, r.v) for r in rows] == [("a", 1)]   # not doubled


# -- sidecar min/max commit pruning ----------------------------------------

def test_read_between_prunes_commits_zero_io(spark, io):
    """Three profiled commits with disjoint v ranges: a bounded read must
    return the right rows AND physically scan only the overlapping
    commit's files (inputFiles is the mechanical proof)."""
    def batch(lo):
        return spark.range(lo, lo + 10).selectExpr(
            "cast(id as int) as v", "cast(id as string) as k")
    s = [io.append(batch(lo), "t", stats_cols=("v",))
         for lo in (0, 100, 200)]
    df = io.read_appended_between(spark, "t", "v", 100, 109)
    assert sorted(r.v for r in df.collect()) == list(range(100, 110))
    files = df.inputFiles()
    assert files and all(f"snap-{s[1]}" in f for f in files)
    # boundary overlap: [105, 205] must read commits 2 and 3, not 1
    df2 = io.read_appended_between(spark, "t", "v", 105, 205)
    assert {f.split("snap-")[1].split("/")[0] for f in df2.inputFiles()} \
        == {s[1], s[2]}
    assert df2.count() == 11


def test_read_between_conservative_without_sidecar(spark, io):
    io.append(spark.range(5).selectExpr("cast(id as int) as v"), "t")
    io.append(spark.range(100, 105).selectExpr("cast(id as int) as v"),
              "t", stats_cols=("v",))
    # first commit unprofiled -> must still be read (conservative)
    df = io.read_appended_between(spark, "t", "v", 0, 4)
    assert sorted(r.v for r in df.collect()) == [0, 1, 2, 3, 4]


def test_read_between_with_markers_falls_back_correct(spark, io):
    io.append(_kv(spark, [("a", 1), ("b", 200)]), "t")
    io.delete_keys(_kv(spark, [("a", 0)]), "t", "k")
    got = io.read_appended_between(spark, "t", "v", 100, 300).collect()
    assert [(r.k, r.v) for r in got] == [("b", 200)]


def test_read_between_unbounded_sides(spark, io):
    for lo in (0, 100):
        io.append(spark.range(lo, lo + 10).selectExpr(
            "cast(id as int) as v"), "t", stats_cols=("v",))
    assert io.read_appended_between(spark, "t", "v", lo=100).count() == 10
    assert io.read_appended_between(spark, "t", "v", hi=9).count() == 10
    assert io.read_appended_between(spark, "t", "v").count() == 20


def test_mor_random_op_sequence_matches_model(spark, io):
    """Differential test: a seeded random append/upsert/delete sequence
    must match a pure-python sequence-number model of the equality-delete
    semantics (rows survive iff no delete/upsert marker with a LATER seq
    shares their key; an upsert's own rows survive their own marker)."""
    import random

    rng = random.Random(42)
    keys = list("abcdef")
    rows, marks = [], []            # (seq, k, v) / (seq, k)
    for seq in range(24):
        op = rng.choice(("append", "upsert", "delete"))
        picked = rng.sample(keys, rng.randint(1, 3))
        vals = [(k, seq * 100 + i) for i, k in enumerate(picked)]
        if op == "append":
            io.append(_kv(spark, vals), "t")
            rows += [(seq, k, v) for k, v in vals]
        elif op == "upsert":
            io.upsert(_kv(spark, vals), "t", "k")
            rows += [(seq, k, v) for k, v in vals]
            marks += [(seq, k) for k, _ in vals]
        else:
            io.delete_keys(_kv(spark, vals), "t", "k")
            marks += [(seq, k) for k, _ in vals]
    dmax = {}
    for seq, k in marks:
        dmax[k] = max(dmax.get(k, -1), seq)
    expect = sorted((k, v) for seq, k, v in rows
                    if seq >= dmax.get(k, -1))
    got = sorted((r.k, r.v)
                 for r in io.read_appended(spark, "t").collect())
    assert got == expect


def test_merge_schema_reads_evolved_table(spark, io):
    io.append(_kv(spark, [("a", 1)]), "t")
    io.append(_kv(spark, [("b", 2)]).withColumn(
        "w", __import__("pyspark.sql.functions", fromlist=["F"])
        .lit(7)), "t")
    df = io.read_appended(spark, "t", merge_schema=True)
    assert set(df.columns) == {"k", "v", "w"}
    got = {r.k: r.w for r in df.collect()}
    assert got == {"a": None, "b": 7}


def test_read_between_random_bounds_match_full_filter(spark, io):
    """Differential: for seeded random commit ranges and query bounds,
    the pruned read must equal filtering the full read — including
    exact-boundary and empty-result cases."""
    import random

    rng = random.Random(7)
    los = [rng.randrange(0, 900, 25) for _ in range(6)]
    for lo in los:
        io.append(spark.range(lo, lo + 25).selectExpr(
            "cast(id as int) as v"), "t", stats_cols=("v",))
    full = io.read_appended(spark, "t")
    for _ in range(10):
        a = rng.randrange(-50, 950)
        b = a + rng.randrange(0, 200)
        want = sorted(r.v for r in full.filter(
            (full.v >= a) & (full.v <= b)).collect())
        got = sorted(r.v for r in io.read_appended_between(
            spark, "t", "v", a, b).collect())
        assert got == want, (a, b)


def test_expire_snapshots_keeps_recent_time_travel(spark, io):
    snaps = [io.append(_kv(spark, [(c, i)]), "t")
             for i, c in enumerate("abcde")]
    before = {(r.k, r.v) for r in io.read_appended(spark, "t").collect()}
    assert io.expire_snapshots(spark, "t", keep_last=2) == 3
    after = {(r.k, r.v) for r in io.read_appended(spark, "t").collect()}
    assert after == before
    # recent time travel intact: as of the 4th commit, e is absent
    tt = {r.k for r in
          io.read_appended(spark, "t", as_of=snaps[3]).collect()}
    assert tt == {"a", "b", "c", "d"}
    # folded commits are gone from the timeline
    with pytest.raises(ValueError):
        io.read_appended(spark, "t", as_of=snaps[0])
    assert io.vacuum("t") == 3


def test_expire_then_suffix_delete_still_hides_prefix_rows(spark, io):
    io.append(_kv(spark, [("a", 1), ("b", 2)]), "t")
    io.append(_kv(spark, [("c", 3)]), "t")
    io.delete_keys(_kv(spark, [("a", 0)]), "t", "k")
    assert io.expire_snapshots(spark, "t", keep_last=1) == 2
    got = {r.k: r.v for r in io.read_appended(spark, "t").collect()}
    assert got == {"b": 2, "c": 3}     # kept marker still hides prefix a
    # and folding the marker in later applies it physically
    io.append(_kv(spark, [("d", 4)]), "t")
    assert io.expire_snapshots(spark, "t", keep_last=1) == 2
    got = {r.k: r.v for r in io.read_appended(spark, "t").collect()}
    assert got == {"b": 2, "c": 3, "d": 4}


def test_expire_noop_cases(spark, io):
    io.append(_kv(spark, [("a", 1)]), "t")
    io.append(_kv(spark, [("b", 2)]), "t")
    assert io.expire_snapshots(spark, "t", keep_last=2) == 0
    assert io.expire_snapshots(spark, "t", keep_last=8) == 0


def test_describe_table_reports_state_and_recommendations(spark, io):
    for i in range(3):
        io.append(_kv(spark, [("a", i)]), "t", stats_cols=("v",))
    io.delete_keys(_kv(spark, [("a", 0)]), "t", "k")
    rep = io.describe_table("t")
    assert rep["commits"] == 4
    assert rep["by_kind"] == {"append": 3, "delete": 1}
    assert rep["delete_or_upsert_markers"] == 1
    assert rep["stats_sidecars"] == 3 and rep["profiled_rows"] == 3
    assert not rep["has_stats_baseline"] and rep["recommend"] == []
    # an orphaned dir triggers the vacuum recommendation
    io.rollback("t", io.snapshots("t")[1]["snap"])
    rep2 = io.describe_table("t")
    assert rep2["orphaned_data_dirs"] == 2
    assert any(r.startswith("vacuum") for r in rep2["recommend"])


def test_mor_plan_size_scales_with_markers_not_commits(spark, io):
    """20 data commits around ONE delete marker must plan as segment
    scans (one per marker-free run) plus the marker scan — not one union
    branch per commit."""
    for i in range(10):
        io.append(_kv(spark, [(f"a{i}", i)]), "t")
    io.delete_keys(_kv(spark, [("a3", 0)]), "t", "k")
    for i in range(10, 20):
        io.append(_kv(spark, [(f"a{i}", i)]), "t")
    df = io.read_appended(spark, "t")
    assert df.count() == 19
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans <= 3, f"{n_scans} scans for 21 commits"


def test_has_manifest_row_is_o1_and_compaction_safe(spark, tmp_path):
    """The streaming replay guard: row existence via a single stat of the
    row's own part file, surviving compact_manifest's fold into the
    consolidated blob."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    io = ParquetTableIO(str(tmp_path / "m"))
    io.commit_manifest_row("epochs", 3, {"ok": True})
    assert io.has_manifest_row("epochs", 3)
    assert not io.has_manifest_row("epochs", 4)
    assert not io.has_manifest_row("other_scope", 3)
    io.compact_manifest("epochs")
    assert io.has_manifest_row("epochs", 3)      # blob fallback
    assert not io.has_manifest_row("epochs", 4)
