"""Persisted ANN index (operators/similarity.AnnIndex) — the embedding
twin of DedupIndex (VERDICT r4 ask #1): build once, admit increments
without touching the base table, probe the persisted inverted file with
file-level pruning, roll a bad increment back.

Reference analogue: the framework's pools persist across the stream
(/root/reference/utils/StreamProcessor.py:57) instead of being rebuilt
per sample — here the quantizer + cell assignments persist across runs.
"""

import io as _io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.operators import similarity
from drift_detection_pibic___framework_spark.sources.tableio import (
    ParquetTableIO)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _rows(df):
    return sorted((r.query_id, r.nbr_id, r.cosine, r.rank)
                  for r in df.collect())


def _plan_text(df) -> str:
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_ann_index_search_matches_one_shot_ivf(spark, emb, tmp_path):
    """build(half) + admit(other half) must reconstruct EXACTLY the
    one-shot inverted file: search over the persisted index is
    bit-identical to ivf_topk over the full table with the same literal
    quantizer."""
    C = similarity.random_unit_centroids(64, 16, seed=42)
    idx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / "ann")))
    idx.build(emb.filter(F.col("vec_id") % 2 == 0), centroids=C)
    idx.admit(emb.filter(F.col("vec_id") % 2 == 1))

    queries = emb.filter(F.col("vec_id") < 20)
    got = _rows(idx.search(spark, queries, k=5, n_probe=4))
    want = _rows(similarity.ivf_topk(emb, queries, k=5, n_probe=4,
                                     centroids=C))
    assert got == want and len(got) == 20 * 5


def test_ann_admit_never_scans_base_table(spark, emb, tmp_path):
    """The O(increment) contract: admit()'s plan reads ONLY the increment
    — zero scans of the already-indexed base vectors (assignment is a
    narrow codegen projection against the persisted centroid literal),
    and zero reads of the existing ann_cells table."""
    base_path = str(tmp_path / "base_vecs")
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(base_path)
    base = spark.read.parquet(base_path)

    idx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / "ann")))
    idx.build(base, centroids=similarity.random_unit_centroids(64, 16))

    inc = emb.filter(F.col("vec_id") % 2 == 1)
    C = idx.centroids()
    assigned = similarity.with_ivf_cell(
        inc.select(F.col("vec_id"), F.col("embedding")), C, "embedding")
    plan = _plan_text(assigned)
    assert base_path not in plan, "admit assignment plan scans the base"
    assert "ann_cells" not in plan


def test_ann_search_prunes_unprobed_cell_files(spark, emb, tmp_path):
    """A search must scan only the probed cells' parquet files: the
    footer min/max sidecar (range-clustered layout on ivf_cell) proves
    the rest of the inverted file out of the plan — at 10^12 vectors a
    query batch reads ~n_probe/n_centroids of the table, never all of
    it."""
    C = similarity.random_unit_centroids(64, 16, seed=42)
    idx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / "ann")))
    idx.build(emb.filter(F.col("vec_id") % 2 == 0), centroids=C)
    idx.admit(emb.filter(F.col("vec_id") % 2 == 1))

    one_query = emb.filter(F.col("vec_id") == 3)
    res = idx.search(spark, one_query, k=5, n_probe=2)
    assert res.count() == 5
    rep = idx.last_probe_report
    assert rep["cells_probed"] == 2
    assert 0 < rep["files_kept"] < rep["files_total"], rep

    # and the pruned-path scan agrees with the unpruned fallback
    cells = [r.ivf_cell for r in
             similarity.with_ivf_cell(
                 emb.select("vec_id", "embedding"), C)
             .select("ivf_cell").distinct().collect()]
    full = idx._read_cells(spark, cells)
    assert full.count() == emb.count()


def test_ann_index_cold_start_and_fitted_centroids(spark, emb, tmp_path):
    """A NEW AnnIndex instance over the same root loads the persisted
    quantizer (no refit — cell ids stay stable) and searches identically;
    the fitted-quantizer path persists whatever k-means produced."""
    root = str(tmp_path / "ann")
    idx = similarity.AnnIndex(ParquetTableIO(root))
    idx.build(emb, n_centroids=8, sample_rows=500, seed=7)
    C1 = idx.centroids()

    idx2 = similarity.AnnIndex(ParquetTableIO(root))  # cold start
    C2 = idx2.centroids()
    assert C1.shape == (8, 64) and (C1 == C2).all()

    q = emb.filter(F.col("vec_id") < 10)
    assert _rows(idx.search(spark, q, k=3, n_probe=3)) == \
        _rows(idx2.search(spark, q, k=3, n_probe=3))


def test_ann_index_unbuilt_raises(tmp_path):
    idx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / "ann")))
    with pytest.raises(ValueError, match="not built"):
        idx.centroids()


def test_ann_index_rollback_unwinds_increment(spark, emb, tmp_path):
    """Commit/rollback round-trip: a poisoned increment's vectors appear
    in search results while committed and vanish after rollback via its
    token — base results return to the pre-increment state."""
    C = similarity.random_unit_centroids(64, 16, seed=42)
    idx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / "ann")))
    base_token = idx.build(emb.filter(F.col("vec_id") >= 100),
                           centroids=C)

    q = emb.filter(F.col("vec_id") < 5)
    before = _rows(idx.search(spark, q, k=5, n_probe=16))

    # poisoned increment: exact copies of the query vectors under new ids
    poisoned = q.select((F.col("vec_id") + 900000).alias("vec_id"),
                        "embedding")
    idx.admit(poisoned)
    during = idx.search(spark, q, k=5, n_probe=16)
    hits = during.filter(F.col("nbr_id") >= 900000).collect()
    assert len(hits) == 5 and all(r.cosine == 1.0 and r.rank == 1
                                  for r in hits)

    # rollback semantics match DedupIndex: undo every commit AFTER the
    # given token — rolling back to the base unwinds the poisoned commit
    idx.rollback(base_token)
    after = _rows(idx.search(spark, q, k=5, n_probe=16))
    assert after == before


def test_ann_index_refuses_rebuild_on_committed_root(spark, emb, tmp_path):
    """Re-building over an existing inverted file would replace the
    quantizer while old rows keep cells assigned under the previous one —
    silently wrong search results. build() must refuse; admit() is the
    way to grow an index."""
    import pytest
    io = ParquetTableIO(str(tmp_path / "idx"))
    idx = similarity.AnnIndex(io)
    idx.build(emb, centroids=similarity.random_unit_centroids(64, 8))
    with pytest.raises(ValueError, match="fresh root"):
        idx.build(emb, centroids=similarity.random_unit_centroids(64, 4))


def test_search_pins_exactly_one_probe_frame(spark, emb, tmp_path):
    """The CLUSTER-side fallback (query batch over ``driver_probe_rows``,
    forced here with cap=0) persists its probed-query frame (it feeds the
    cell collect AND the join) and releases it on the next search /
    release() — at most one small pinned frame per index, never an
    accumulation (r5 review)."""
    C = similarity.random_unit_centroids(64, 16, seed=42)
    idx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / "pin")),
                              driver_probe_rows=0)
    idx.build(emb, centroids=C)
    q = emb.filter("vec_id < 3")
    idx.search(spark, q, k=3, n_probe=2).count()
    first = idx._pinned
    assert first is not None and first.storageLevel.useMemory
    # a DIFFERENT query frame (cache lookups are by canonicalized plan,
    # so an identical second search would alias the first's entry)
    idx.search(spark, emb.filter("vec_id >= 7 and vec_id < 9"),
               k=3, n_probe=2).count()
    assert not first.storageLevel.useMemory        # previous pin released
    assert idx._pinned is not None and idx._pinned is not first
    idx.release()
    assert idx._pinned is None


def test_driver_probe_parity_with_cluster_path(spark, emb, tmp_path):
    """The driver-side probe mirror (``_probe_local``) is BIT-identical
    to the cluster-side expression path: same probed cells, same scores,
    same ranks — the numpy accumulation reproduces ``F.aggregate``'s
    sequential fold and the struct-sort's cell-desc tie-break, so the
    swap is invisible to the oracle-hashed results.  Also pins the
    shared garbage-input convention: a NULL query vector yields NO
    result rows on either path."""
    from pyspark.sql.types import (ArrayType, FloatType, LongType,
                                   StructField, StructType)

    C = similarity.random_unit_centroids(64, 16, seed=42)
    root = str(tmp_path / "dp")
    idx = similarity.AnnIndex(ParquetTableIO(root))          # driver path
    idx.build(emb, centroids=C)
    idx0 = similarity.AnnIndex(ParquetTableIO(root),
                               driver_probe_rows=0)          # cluster path
    q = emb.filter(F.col("vec_id") < 20)
    got, want = (_rows(i.search(spark, q, k=5, n_probe=4))
                 for i in (idx, idx0))
    assert got == want and len(got) == 20 * 5
    # driver path pins nothing and still reports file pruning
    assert idx._pinned is None
    assert idx.last_probe_report["fallback"] is False
    # NULL query vector: dropped identically (no NULL-scored rank rows)
    sch = StructType([StructField("vec_id", LongType()),
                      StructField("embedding", ArrayType(FloatType()))])
    v1 = emb.filter("vec_id = 1").first().embedding
    qn = spark.createDataFrame([(1, list(v1)), (2, None)], sch)
    a, b = (_rows(i.search(spark, qn, k=3, n_probe=4))
            for i in (idx, idx0))
    assert a == b and {r[0] for r in a} == {1}
    idx0.release()


def test_driver_probe_cap_falls_back_to_cluster_path(spark, emb, tmp_path):
    """A query batch bigger than ``driver_probe_rows`` falls back to
    cluster-side scoring (observable via the pinned probe frame) and
    returns the same results."""
    C = similarity.random_unit_centroids(64, 16, seed=42)
    root = str(tmp_path / "cap")
    idx = similarity.AnnIndex(ParquetTableIO(root), driver_probe_rows=4)
    idx.build(emb, centroids=C)
    q = emb.filter(F.col("vec_id") < 10)      # 10 rows > cap of 4
    via_fallback = _rows(idx.search(spark, q, k=3, n_probe=2))
    assert idx._pinned is not None            # cluster path engaged
    idx.release()
    idx.driver_probe_rows = 65536
    via_driver = _rows(idx.search(spark, q, k=3, n_probe=2))
    assert idx._pinned is None                # driver path engaged
    assert via_fallback == via_driver and len(via_driver) == 10 * 3


def test_plan_probe_single_pass_report(spark, emb, tmp_path):
    """plan_probe prunes in ONE sidecar pass (OR-of-ranges predicate) and
    still reports per-file keep/total evidence."""
    C = similarity.random_unit_centroids(64, 16, seed=42)
    idx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / "probe")))
    idx.build(emb, centroids=C)
    paths, rep = idx.plan_probe([0, 3])
    assert rep["fallback"] is False and rep["cells_probed"] == 2
    assert 0 < rep["files_kept"] < rep["files_total"]
    assert len(paths) == rep["files_kept"]
    # a probed superset keeps at least as many files
    _, rep_all = idx.plan_probe(range(16))
    assert rep_all["files_kept"] >= rep["files_kept"]


def test_ann_index_compact_preserves_search(spark, emb, tmp_path):
    """compact() folds every admit commit into ONE re-clustered rewrite:
    search results are bit-identical across the compaction, and the
    probe's file universe shrinks back to one commit's n_files (the
    Iceberg rewrite_data_files + sort-order moment)."""
    C = similarity.random_unit_centroids(64, 16, seed=42)
    idx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / "annc")),
                              n_files=8)
    idx.build(emb.filter(F.col("vec_id") % 3 == 0), centroids=C)
    idx.admit(emb.filter(F.col("vec_id") % 3 == 1))
    idx.admit(emb.filter(F.col("vec_id") % 3 == 2))
    q = emb.filter(F.col("vec_id") < 4)
    before = _rows(idx.search(spark, q, k=5, n_probe=3))
    files_before = idx.last_probe_report["files_total"]
    idx.compact(spark)
    after = _rows(idx.search(spark, q, k=5, n_probe=3))
    files_after = idx.last_probe_report["files_total"]
    assert after == before and before
    # 3 commits x 8 files -> one 8-file clustered rewrite
    assert files_after < files_before
    assert files_after <= 8
    # pruning still engages on the compacted layout
    assert idx.last_probe_report["files_kept"] < files_after
    idx.release()
