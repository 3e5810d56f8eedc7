"""End-to-end text curation job (jobs/curate.py) with the span/line/
weighted-sample stages composed."""

import sys


def test_curate_job_end_to_end(spark, tmp_path, monkeypatch):
    """quality -> dedup -> span strip -> weighted sample -> write: the
    output is exactly K docs, all dedup survivors, with text present."""
    import jobs.curate as J

    out = str(tmp_path / "curated")
    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--data", "/root/testdata/sf0.001", "--out", out,
        "--strip-lines", "3", "--strip-spans", "8",
        "--weighted-sample", "120", "--target-file-mb", "0"])
    assert J.main() == 0

    cur = spark.read.parquet(out)
    rows = cur.collect()
    assert len(rows) == 120
    assert all(r["text"] is not None and r["doc_id"] is not None
               for r in rows)
    # weighted sample is deterministic: a second run reproduces the
    # exact same doc_id set
    out2 = str(tmp_path / "curated2")
    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--data", "/root/testdata/sf0.001", "--out", out2,
        "--strip-lines", "3", "--strip-spans", "8",
        "--weighted-sample", "120", "--target-file-mb", "0"])
    assert J.main() == 0
    a = {r["doc_id"] for r in rows}
    b = {r["doc_id"] for r in spark.read.parquet(out2).collect()}
    assert a == b


def test_curate_admit_stream_cli(spark, tmp_path, monkeypatch):
    """--admit-stream drains a feed through the persisted-index gate:
    exact duplicates across arrival files are admitted once, the manifest
    records every epoch, and missing plumbing args are a usage error."""
    import os

    import jobs.curate as J

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    rows = [
        [(1, "alpha bravo charlie delta echo foxtrot golf hotel india"),
         (2, "one two three four five six seven eight nine ten")],
        [(3, "alpha bravo charlie delta echo foxtrot golf hotel india"),
         (4, "a genuinely different document with its very own words")],
    ]
    for i, rs in enumerate(rows):
        (spark.createDataFrame(rs, "doc_id long, text string").coalesce(1)
         .write.parquet(f"{feed}/f{i}"))
        os.system(f"mv {feed}/f{i}/part-*.parquet {feed}/arrive-{i}.parquet"
                  f" && rm -r {feed}/f{i}")
    out = str(tmp_path / "admitted")
    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--admit-stream", str(tmp_path / "idx"),
        "--feed", feed, "--out", out,
        "--checkpoint", str(tmp_path / "ckpt")])
    assert J.main() == 0
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 4]                      # 3 deduped cross-epoch

    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--admit-stream", str(tmp_path / "idx2")])
    assert J.main() == 2                         # missing plumbing args
