"""End-to-end image curation job (jobs/curate_images.py): decode gate ->
dHash near-dup drop -> thumbnail re-encode -> curated write, over the
deterministic distributed synthetic table."""

import sys

import numpy as np

from drift_detection_pibic___framework_spark.operators import images as I


def test_curate_images_job_end_to_end(spark, tmp_path, monkeypatch):
    """At N=1000 the injection schedule is fully predictable: 20 truncated
    (id%50==17) + 15 compressed (id%70==23, none colliding with the
    truncated slots) divert; all 49 noised twins (id%20==0, id>0, encoded
    in their source's format) dedup away; every curated row carries a
    decodable (size x size) PGM thumbnail and its feature columns."""
    import jobs.curate_images as J

    out = str(tmp_path / "curated_img")
    monkeypatch.setattr(sys, "argv", [
        "curate_images.py", "--synth", "1000", "--out", out,
        "--thumb-size", "6", "--dedup-hamming", "6"])
    assert J.main() == 0

    n_trunc = len([i for i in range(1000) if i % 50 == 17])
    n_png = len([i for i in range(1000)
                 if i % 70 == 23 and i % 50 != 17])
    n_twins = len([i for i in range(1000) if i % 20 == 0 and i > 0])
    cur = spark.read.parquet(out)
    assert cur.count() == 1000 - n_trunc - n_png - n_twins

    rows = cur.limit(25).collect()
    for r in rows:
        t = I.decode_pnm(bytes(r["thumb"]))
        assert t.shape == (6, 6) and t.dtype == np.uint8
        assert r["width"] == 24 and r["height"] == 24
        assert -(1 << 63) <= r["dhash"] < (1 << 63)
    # diverted rows (broken payloads) are absent, not zero-filled
    ids = {r.img_id for r in cur.select("img_id").collect()}
    assert "img00000017" not in ids          # truncated
    assert "img00000023" not in ids          # compressed
    assert "img00000020" not in ids          # twin of img00000019
    assert "img00000019" in ids              # its source representative


def test_curate_images_mode_exclusivity(monkeypatch, capsys):
    import jobs.curate_images as J
    monkeypatch.setattr(sys, "argv", ["curate_images.py"])
    assert J.main() == 2
    monkeypatch.setattr(sys, "argv", [
        "curate_images.py", "--synth", "5", "--images", "/nope"])
    assert J.main() == 2
