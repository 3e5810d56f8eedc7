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
