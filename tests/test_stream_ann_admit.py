"""Streaming embedding admission into the persisted AnnIndex
(streaming/stream_ann_admit.py): stream-grown index == batch-grown index,
exactly-once under epoch replay and half-commit crashes, loud refusal of
an unbuilt root."""

import os

import pytest
from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.operators import similarity
from drift_detection_pibic___framework_spark.sources.tableio import (
    ParquetTableIO)
from drift_detection_pibic___framework_spark.streaming.stream_ann_admit import (
    ANN_ADMIT_SCOPE, AnnAdmissionGate, ann_admission_stream)
from drift_detection_pibic___framework_spark.streaming.stream_admit import (
    run_tag_for)

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = "vec_id bigint, embedding array<float>"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _rows(df):
    return sorted((r.query_id, r.nbr_id, r.cosine, r.rank)
                  for r in df.collect())


def test_stream_grown_index_matches_batch_grown(spark, emb, tmp_path):
    """build(base) + 3 streamed epochs == build(base) + one batch admit:
    search results over the persisted inverted file are bit-identical,
    and both equal one-shot ivf_topk over the full table."""
    C = similarity.random_unit_centroids(64, 16, seed=42)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    inc = emb.filter(F.col("vec_id") % 2 == 1)

    bidx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / "b")))
    bidx.build(base, centroids=C)
    bidx.admit(inc)

    sroot = str(tmp_path / "s")
    sidx = similarity.AnnIndex(ParquetTableIO(sroot))
    sidx.build(base, centroids=C)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i in range(3):
        part = inc.filter(F.col("vec_id") % 3 == i).coalesce(1)
        part.write.parquet(f"{feed}/f{i}")
        os.system(f"mv {feed}/f{i}/part-*.parquet {feed}/arrive-{i}.parquet"
                  f" && rm -r {feed}/f{i}")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = ann_admission_stream(spark, feed, SCHEMA, out, ckpt, sroot)
    q.awaitTermination(120)

    queries = emb.filter(F.col("vec_id") < 15)
    got = _rows(sidx.search(spark, queries, k=5, n_probe=4))
    want = _rows(bidx.search(spark, queries, k=5, n_probe=4))
    oneshot = _rows(similarity.ivf_topk(emb, queries, k=5, n_probe=4,
                                        centroids=C))
    assert got == want == oneshot and len(got) == 15 * 5
    # one manifest row per epoch, scoped by checkpoint identity
    scope = f"{ANN_ADMIT_SCOPE}-{run_tag_for(ckpt)}"
    assert sorted(sidx.io.read_manifest(scope)) == [0, 1, 2]
    # inspection sink carries every streamed vec_id exactly once
    sunk = sorted(r.vec_id for r in spark.read.parquet(out).collect())
    assert sunk == sorted(r.vec_id for r in inc.collect())


def _gate(spark, emb, tmp_path, name="g"):
    C = similarity.random_unit_centroids(64, 16, seed=42)
    idx = similarity.AnnIndex(ParquetTableIO(str(tmp_path / name)))
    idx.build(emb.filter(F.col("vec_id") % 2 == 0), centroids=C)
    return idx, AnnAdmissionGate(idx, str(tmp_path / f"{name}_out"))


def test_replayed_epoch_is_noop(spark, emb, tmp_path):
    idx, gate = _gate(spark, emb, tmp_path, "r")
    inc = emb.filter(F.col("vec_id") % 2 == 1)
    gate(inc, 0)
    snaps = len(idx.io.snapshots(idx.CELLS))
    n = idx.io.read_appended(spark, idx.CELLS).count()
    gate(inc, 0)                     # at-least-once replay of epoch 0
    assert len(idx.io.snapshots(idx.CELLS)) == snaps
    assert idx.io.read_appended(spark, idx.CELLS).count() == n


def test_half_commit_crash_recovers_exactly_once(spark, emb, tmp_path):
    """A crash AFTER the cells append but BEFORE the manifest row: the
    pending record rolls the table back, and the re-delivered epoch
    admits exactly once."""
    idx, gate = _gate(spark, emb, tmp_path, "c")
    inc = emb.filter(F.col("vec_id") % 2 == 1)
    # simulate: pending committed, append happened, manifest row never did
    gate.io.commit_state(gate.pending_scope,
                         {"epoch": 0, "tip": gate._tip()})
    idx.admit(inc)
    n_partial = idx.io.read_appended(spark, idx.CELLS).count()
    gate(inc, 0)                     # re-delivery
    assert gate.recover() is False   # pending cleared by the re-delivery
    assert idx.io.read_appended(spark, idx.CELLS).count() == n_partial
    assert idx.io.has_manifest_row(gate.admit_scope, 0)


def test_pending_after_manifest_never_rolls_back(spark, emb, tmp_path):
    """A pending record whose epoch IS manifested (crash between manifest
    commit and pending-clear) must only be cleared — the committed admit
    survives."""
    idx, gate = _gate(spark, emb, tmp_path, "p")
    inc = emb.filter(F.col("vec_id") % 2 == 1)
    tip_before = gate._tip()
    gate(inc, 0)
    n = idx.io.read_appended(spark, idx.CELLS).count()
    gate.io.commit_state(gate.pending_scope,
                         {"epoch": 0, "tip": tip_before})
    assert gate.recover() is False   # manifested: clear, don't roll back
    assert idx.io.read_appended(spark, idx.CELLS).count() == n


def test_unbuilt_root_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="no fitted quantizer"):
        ann_admission_stream(
            spark, str(tmp_path / "nofeed"), SCHEMA,
            str(tmp_path / "out"), str(tmp_path / "ckpt"),
            str(tmp_path / "fresh_root"))


def test_state_without_cells_refused_with_remedy(spark, tmp_path):
    """A build that crashed between commit_state and its first admit
    leaves a quantizer with no cells commit; the stream must refuse
    loudly with the rebuild remedy instead of dying in _tip() with a
    bare IndexError mid-stream."""
    io = ParquetTableIO(str(tmp_path / "half"))
    io.commit_state(similarity.AnnIndex.STATE,
                    {"centroids": [[0.0] * 64], "n_centroids": 1,
                     "dim": 64, "id_col": "vec_id",
                     "vec_col": "embedding"})
    with pytest.raises(ValueError, match="no cells commit"):
        ann_admission_stream(
            spark, str(tmp_path / "feed"), SCHEMA,
            str(tmp_path / "out"), str(tmp_path / "ckpt"),
            str(tmp_path / "half"))
