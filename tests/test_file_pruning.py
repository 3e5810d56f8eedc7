"""File-level min/max pruning + clustered writes (sources/tableio.py
write_clustered / plan_where / read_where, functions/zorder.py).

Contract under test — the Iceberg manifest-pruning story:
  * footer stats are harvested per file at commit, zero data IO;
  * a clustered write makes those ranges SELECTIVE, so a bounded
    predicate skips most files (proven via the plan report AND
    df.inputFiles());
  * the residual filter always re-applies, so pruned reads are
    row-for-row equal to a full scan + filter;
  * merge-on-read markers force the documented fallback;
  * stat-less commits read conservatively (never lose rows).
"""

import pytest
from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.functions.zorder import (
    bucket_code, cluster_bounds, zvalue)
from drift_detection_pibic___framework_spark.sources.tableio import (
    ParquetTableIO)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def seq_df(spark):
    # 4000 rows, two independent-ish numeric axes + a payload column
    return spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("a"),
        F.pmod(F.col("id") * 37 + 11, F.lit(101)).cast("int").alias("b"),
        F.md5(F.col("id").cast("string")).alias("payload"))


def test_range_clustered_pruning_equals_full_filter(spark, tmp_path, seq_df):
    io = ParquetTableIO(str(tmp_path))
    io.write_clustered(seq_df, "t", ["k"], n_files=16)
    preds = {"k": (1000, 1199)}
    paths, rep = io.plan_where("t", preds)
    assert rep["files_total"] == 16
    # 200/4000 of a 16-file range layout -> at most a few boundary files
    assert rep["files_kept"] <= 3, rep
    got = io.read_where(spark, "t", preds)
    assert len(got.inputFiles()) == rep["files_kept"]
    want = io.read_appended(spark, "t").filter(
        (F.col("k") >= 1000) & (F.col("k") <= 1199))
    assert _rows(got) == _rows(want)
    assert got.count() == 200


def test_commit_level_pruning_across_commits(spark, tmp_path, seq_df):
    io = ParquetTableIO(str(tmp_path))
    for lo in (0, 1000, 2000, 3000):
        io.write_clustered(
            seq_df.filter((F.col("k") >= lo) & (F.col("k") < lo + 1000)),
            "t", ["k"], n_files=4)
    paths, rep = io.plan_where("t", {"k": (2500, 2599)})
    assert rep["commits"] == 4
    # 3 commits can't overlap [2500, 2599]; commit-level bigint min/max
    # (integral column -> trusted) prunes them without opening a footer
    assert rep["commits_pruned"] == 3
    got = io.read_where(spark, "t", {"k": (2500, 2599)})
    assert got.count() == 100
    assert all("/snap-" in p for p in got.inputFiles())


def test_zorder_box_prunes_both_axes(spark, tmp_path, seq_df):
    io = ParquetTableIO(str(tmp_path))
    io.write_clustered(seq_df, "z", ["a", "b"], n_files=16)
    io.write_clustered(seq_df, "lin", ["a"], n_files=16)
    box = {"a": (10, 30), "b": (10, 30)}
    _, zrep = io.plan_where("z", box)
    _, lrep = io.plan_where("lin", box)
    # z-order: each file covers a small (a, b) rectangle, so a 21x21 box
    # out of ~97x101 touches a minority of the 16 files; the a-only
    # linear layout prunes on a but is blind on b
    assert zrep["files_kept"] < zrep["files_total"], zrep
    assert zrep["files_kept"] <= lrep["files_kept"], (zrep, lrep)
    got = io.read_where(spark, "z", box)
    want = seq_df.filter((F.col("a").between(10, 30))
                         & (F.col("b").between(10, 30)))
    assert _rows(got) == _rows(want)
    # and the b-axis alone (the axis linear clustering can't serve):
    bonly = {"b": (0, 5)}
    _, zb = io.plan_where("z", bonly)
    assert zb["files_kept"] < zb["files_total"], zb


def test_unclustered_commit_reads_conservatively(spark, tmp_path, seq_df):
    io = ParquetTableIO(str(tmp_path))
    # plain append, no stats sidecar at all
    io.append(seq_df.repartition(4), "t")
    paths, rep = io.plan_where("t", {"k": (0, 9)})
    assert rep["files_total"] == 0 and rep["commits_pruned"] == 0
    got = io.read_where(spark, "t", {"k": (0, 9)})
    assert got.count() == 10  # residual filter still applies


def test_marker_table_falls_back_to_merge_on_read(spark, tmp_path, seq_df):
    io = ParquetTableIO(str(tmp_path))
    io.write_clustered(seq_df, "t", ["k"], n_files=8)
    io.upsert(seq_df.filter("k < 10").withColumn(
        "payload", F.lit("v2")), "t", "k")
    paths, rep = io.plan_where("t", {"k": (0, 20)})
    assert paths is None and rep["fallback"]
    got = io.read_where(spark, "t", {"k": (0, 20)})
    assert got.count() == 21
    assert got.filter("payload = 'v2'").count() == 10


def test_provably_empty_band(spark, tmp_path, seq_df):
    io = ParquetTableIO(str(tmp_path))
    io.write_clustered(seq_df, "t", ["k"], n_files=8)
    paths, rep = io.plan_where("t", {"k": (100000, None)})
    assert paths == []
    assert io.read_where(spark, "t", {"k": (100000, None)}).count() == 0


def test_float_commit_stats_do_not_prune_but_footers_do(
        spark, tmp_path):
    # commit-level sidecar stats are bigint-cast: a float column whose
    # true min is -0.9 profiles as min=0, which would WRONGLY prune
    # hi=-0.5 — plan_where must distrust it (non-integral), while the
    # exact footer stats still prune files
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id").cast("double") / 500.0 - 0.9).alias("x"))
    io = ParquetTableIO(str(tmp_path))
    io.write_clustered(df, "t", ["x"], n_files=8)
    side = io.snapshot_stats("t")[0]
    assert side["cols"]["x"]["min"] == 0  # the truncation hazard is real
    paths, rep = io.plan_where("t", {"x": (None, -0.5)})
    assert rep["commits_pruned"] == 0  # commit level: distrusted
    assert 0 < rep["files_kept"] < rep["files_total"]  # footers: exact
    got = io.read_where(spark, "t", {"x": (None, -0.5)})
    want = df.filter(F.col("x") <= -0.5)
    assert _rows(got) == _rows(want) and got.count() == want.count() > 0


def test_zvalue_expression_properties(spark):
    # z-values are deterministic, within bigint, and adjacent in z-space
    # implies close in (a, b) bucket space (the locality that makes the
    # layout work); also: the 1-column degenerate case is the bucket code
    df = spark.range(256).select(
        (F.col("id") % 16).cast("int").alias("a"),
        (F.col("id") / 16).cast("int").alias("b"))
    bounds = cluster_bounds(df, ["a", "b"])
    assert bounds == {"a": (0.0, 15.0), "b": (0.0, 15.0)}
    z = df.select(zvalue(["a", "b"], bounds, bits=4).alias("z"))
    vals = sorted(r.z for r in z.collect())
    assert vals[0] >= 0 and vals[-1] < (1 << 8)
    assert len(set(vals)) == 256  # 16x16 grid -> distinct Morton codes
    one = df.select(
        zvalue(["a"], bounds, bits=4).alias("z1"),
        bucket_code("a", 0.0, 15.0, 4).alias("bc"))
    assert one.filter("z1 <> bc").count() == 0
    # null rows land deterministically in bucket 0
    nz = (spark.sql("SELECT CAST(NULL AS INT) a, 3 b")
          .select(zvalue(["a", "b"], bounds, bits=4).alias("z")).first().z)
    assert nz >= 0


def test_compact_stats_keeps_pruning_for_kept_sidecars(
        spark, tmp_path, seq_df):
    io = ParquetTableIO(str(tmp_path))
    for lo in (0, 1000, 2000, 3000):
        io.write_clustered(
            seq_df.filter((F.col("k") >= lo) & (F.col("k") < lo + 1000)),
            "t", ["k"], n_files=4)
    folded = io.compact_stats(spark, "t", keep_last=2)
    assert folded == 2
    # folded commits lost their sidecars -> conservative whole-dir reads;
    # the kept ones still prune; rows stay exact either way
    paths, rep = io.plan_where("t", {"k": (3500, 3599)})
    assert rep["commits_pruned"] >= 1  # the kept [2000,3000) commit
    got = io.read_where(spark, "t", {"k": (3500, 3599)})
    assert got.count() == 100


def test_recluster_on_compaction_restores_pruning(spark, tmp_path, seq_df):
    io = ParquetTableIO(str(tmp_path))
    io.write_clustered(seq_df, "t", ["k"], n_files=8)
    # upsert churn: markers force read_where into the fallback path
    io.upsert(seq_df.filter("k % 40 = 0").withColumn(
        "payload", F.lit("v2")), "t", "k")
    paths, rep = io.plan_where("t", {"k": (0, 99)})
    assert rep["fallback"]
    # major compaction WITH a cluster spec: markers applied, layout fixed,
    # footer stats harvested on the rewrite -> pruning selective again
    io.compact_snapshots(spark, "t", cluster_by=["k"], n_files=8)
    paths, rep = io.plan_where("t", {"k": (0, 99)})
    assert not rep["fallback"]
    assert rep["files_total"] == 8 and rep["files_kept"] <= 2, rep
    got = io.read_where(spark, "t", {"k": (0, 99)})
    assert got.count() == 100
    assert got.filter("payload = 'v2'").count() == 3  # k in {0, 40, 80}


def test_read_between_distrusts_nonintegral_commit_stats(spark, tmp_path):
    # read_appended_between shares plan_where's trust rule: the commit
    # sidecar's bigint-cast min/max may only prune INTEGRAL columns.
    # x = -0.5 profiles as min 0; hi=-0.4 would wrongly prune the commit
    # and silently drop the matching row.
    io = ParquetTableIO(str(tmp_path))
    df = spark.createDataFrame([(-0.5,), (2.5,)], "x double")
    io.append(df, "t", stats_cols=("x",))
    got = io.read_appended_between(spark, "t", "x", hi=-0.4)
    assert [r.x for r in got.collect()] == [-0.5]
    # integral columns still prune (the fast path is intact)
    io2 = ParquetTableIO(str(tmp_path / "b"))
    for lo in (0, 100):
        io2.append(spark.range(lo, lo + 10).selectExpr(
            "cast(id as int) as v"), "u", stats_cols=("v",))
    pruned = io2.read_appended_between(spark, "u", "v", 100, 109)
    assert pruned.count() == 10
    assert all("snap-" in f for f in pruned.inputFiles())
    assert len({f.split("snap-")[1].split("/")[0]
                for f in pruned.inputFiles()}) == 1


def test_read_where_pre_log_table_falls_back(spark, tmp_path, seq_df):
    # a table written before the snaplog existed has zero log entries;
    # plan_where must report a FALLBACK (full read), not [] — [] means
    # 'sidecars PROVE empty' and would silently drop every row
    io = ParquetTableIO(str(tmp_path))
    seq_df.limit(50).write.parquet(str(tmp_path / "t" / "snap-legacy"))
    paths, rep = io.plan_where("t", {"k": (0, 9)})
    assert paths is None and rep["fallback"]
    got = io.read_where(spark, "t", {"k": (0, 9)})
    assert got.count() == 10


def test_range_excluded_or_ranges():
    """OR-of-ranges predicate form: excluded only when EVERY range misses
    (lets plan_probe prune a probed-cell set in one sidecar pass)."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    re_ = ParquetTableIO._range_excluded
    stats = {"c": {"n": 5, "min": 10, "max": 20}}
    assert re_(stats, {"c": [(0, 5), (30, 40)]})       # both miss
    assert not re_(stats, {"c": [(0, 5), (15, 15)]})   # one hits
    assert not re_(stats, {"c": [(None, 12), (30, 40)]})
    assert re_(stats, {"c": []} ) is True              # vacuous: no range
    assert not re_(stats, {"c": (15, 15)})             # tuple form intact
    assert re_(stats, {"c": (21, None)})
