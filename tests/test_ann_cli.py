"""jobs/ann.py — the AnnIndex operational CLI: build -> admit -> search
-> rollback lifecycle, probe-report evidence, and usage errors."""

import json
import sys

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_paths(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ann_cli")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(str(d / "base"))
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(str(d / "inc"))
    emb.filter(F.col("vec_id") < 10).write.parquet(str(d / "q"))
    return d


def _run(capsys, *argv):
    import jobs.ann as A
    sys.argv = ["ann.py", *argv]
    rc = A.main()
    return rc, capsys.readouterr().out


def test_ann_cli_lifecycle(emb_paths, monkeypatch, capsys, tmp_path):
    root = str(tmp_path / "idx")

    rc, out = _run(capsys, "--root", root, "--build",
                   str(emb_paths / "base"), "--n-centroids", "8")
    assert rc == 0 and "built:" in out
    build_token = json.loads(out.splitlines()[1])

    rc, out = _run(capsys, "--root", root, "--admit",
                   str(emb_paths / "inc"))
    assert rc == 0 and "admitted:" in out

    rc, out = _run(capsys, "--root", root, "--search",
                   str(emb_paths / "q"), "--k", "3", "--n-probe", "2")
    assert rc == 0
    rep = json.loads(out.splitlines()[-2].split("probe report ")[1])
    assert rep["files_kept"] < rep["files_total"]  # pruned probe
    n_with_inc = int(out.splitlines()[-2].split("search: ")[1]
                     .split(" result")[0])
    assert n_with_inc == 30                        # 10 queries x k=3

    rc, out = _run(capsys, "--root", root, "--describe")
    assert rc == 0 and json.loads(
        out[:out.rindex("}") + 1])["n_centroids"] == 8

    # rollback to the build token: the admitted increment vanishes from
    # search (odd vec_ids can no longer appear as neighbors)
    rc, out = _run(capsys, "--root", root, "--rollback",
                   json.dumps(build_token))
    assert rc == 0
    rc, out = _run(capsys, "--root", root, "--search",
                   str(emb_paths / "q"), "--k", "3", "--n-probe", "2")
    assert rc == 0
    nbrs = [int(line.split("-> ")[1].split()[0])
            for line in out.splitlines() if "-> " in line]
    assert nbrs and all(v % 2 == 0 for v in nbrs)


def test_ann_cli_usage_errors(emb_paths, monkeypatch, capsys, tmp_path):
    root = str(tmp_path / "idx2")
    rc, _ = _run(capsys, "--root", root)                       # no mode
    assert rc == 2
    rc, _ = _run(capsys, "--root", root, "--build", "/nope")   # bad path
    assert rc == 2
    rc, _ = _run(capsys, "--root", root, "--admit",            # unbuilt
                 str(emb_paths / "inc"))
    assert rc == 2
    rc, _ = _run(capsys, "--root", root, "--search",           # unbuilt
                 str(emb_paths / "q"))
    assert rc == 2
    rc, _ = _run(capsys, "--root", root, "--rollback", "junk")
    assert rc == 2


def test_ann_cli_build_on_built_root_is_usage_error(emb_paths, monkeypatch,
                                                    capsys, tmp_path):
    root = str(tmp_path / "idx3")
    rc, _ = _run(capsys, "--root", root, "--build",
                 str(emb_paths / "base"), "--n-centroids", "4")
    assert rc == 0
    rc, _ = _run(capsys, "--root", root, "--build",
                 str(emb_paths / "base"), "--n-centroids", "4")
    assert rc == 2                      # refuse quantizer replacement

    # stale/foreign rollback token: exit 2, not a traceback
    rc, _ = _run(capsys, "--root", root, "--rollback",
                 '{"cells": "deadbeefdeadbeef"}')
    assert rc == 2


def test_ann_cli_pq_lifecycle(emb_paths, monkeypatch, capsys, tmp_path):
    """--build --pq stores codes; --mode adc searches codes only (and
    prints adc_score), --mode refine returns the exact-search contract;
    --describe reports the codebook geometry; adc on a non-PQ root is a
    usage error (exit 2)."""
    root = str(tmp_path / "idxpq")
    rc, out = _run(capsys, "--root", root, "--build",
                   str(emb_paths / "base"), "--n-centroids", "8",
                   "--pq", "--pq-m", "8", "--pq-k", "16")
    assert rc == 0 and "pq 8x16 codebooks" in out

    rc, out = _run(capsys, "--root", root, "--search",
                   str(emb_paths / "q"), "--k", "3", "--n-probe", "2",
                   "--mode", "adc")
    assert rc == 0 and "adc_score=" in out
    rep = json.loads(out.splitlines()[-2].split("probe report ")[1])
    assert rep["files_kept"] < rep["files_total"]

    rc, out = _run(capsys, "--root", root, "--search",
                   str(emb_paths / "q"), "--k", "3", "--n-probe", "4",
                   "--mode", "refine", "--shortlist", "20")
    assert rc == 0 and "cosine=" in out

    rc, out = _run(capsys, "--root", root, "--describe")
    assert rc == 0
    rep = json.loads(out[:out.rindex("}") + 1])
    assert rep["pq"] == {"m": 8, "k": 16, "dsub": 8}

    # adc against an index built WITHOUT codebooks: usage error
    plain = str(tmp_path / "idxplain")
    rc, _ = _run(capsys, "--root", plain, "--build",
                 str(emb_paths / "base"), "--n-centroids", "4")
    assert rc == 0
    rc, _ = _run(capsys, "--root", plain, "--search",
                 str(emb_paths / "q"), "--mode", "adc")
    assert rc == 2


def test_ann_cli_compact(emb_paths, monkeypatch, capsys, tmp_path):
    root = str(tmp_path / "idxc")
    rc, _ = _run(capsys, "--root", root, "--build",
                 str(emb_paths / "base"), "--n-centroids", "8")
    assert rc == 0
    rc, _ = _run(capsys, "--root", root, "--admit",
                 str(emb_paths / "inc"))
    assert rc == 0
    rc, out = _run(capsys, "--root", root, "--compact")
    assert rc == 0 and "compacted to snapshot" in out
    # search still works and prunes on the compacted layout
    rc, out = _run(capsys, "--root", root, "--search",
                   str(emb_paths / "q"), "--k", "3", "--n-probe", "2")
    assert rc == 0
    rep = json.loads(out.splitlines()[-2].split("probe report ")[1])
    assert rep["files_kept"] < rep["files_total"]
    # compact on an unbuilt root: usage error
    rc, _ = _run(capsys, "--root", str(tmp_path / "nope"), "--compact")
    assert rc == 2


def test_ann_cli_stream_admit(emb_paths, monkeypatch, capsys, spark,
                              tmp_path):
    """--stream-admit drives the exactly-once gate over a file feed: the
    grown index answers searches over base + streamed increment, and the
    error paths (missing --checkpoint, unbuilt root) exit 2."""
    import os

    root = str(tmp_path / "sidx")
    rc, _ = _run(capsys, "--root", root, "--build",
                 str(emb_paths / "base"), "--n-centroids", "8")
    assert rc == 0
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    inc = spark.read.parquet(str(emb_paths / "inc"))
    for i in range(2):
        part = inc.filter((F.col("vec_id") / 2 % 2).cast("int") == i)
        part.coalesce(1).write.parquet(f"{feed}/s{i}")
        f = [x for x in os.listdir(f"{feed}/s{i}")
             if x.endswith(".parquet")][0]
        os.rename(f"{feed}/s{i}/{f}", f"{feed}/arrive-{i}.parquet")

    rc, out = _run(capsys, "--root", root, "--stream-admit", feed,
                   "--checkpoint", str(tmp_path / "ckpt"))
    assert rc == 0
    n_inc = inc.count()
    assert f"holds {n_inc} vectors over 2 epochs" in out
    # a re-run over the fully-processed feed is a vacuous stream: zero
    # new epochs, same cumulative sink totals, no crash on the summary
    rc, out = _run(capsys, "--root", root, "--stream-admit", feed,
                   "--checkpoint", str(tmp_path / "ckpt"))
    assert rc == 0
    assert f"holds {n_inc} vectors over 2 epochs" in out

    rc, out = _run(capsys, "--root", root, "--search",
                   str(emb_paths / "q"), "--k", "3", "--n-probe", "2")
    assert rc == 0 and "search: 30 result rows" in out

    rc, _ = _run(capsys, "--root", root, "--stream-admit", feed)
    assert rc == 2                                  # no --checkpoint
    rc, _ = _run(capsys, "--root", str(tmp_path / "fresh"),
                 "--stream-admit", feed, "--checkpoint",
                 str(tmp_path / "ckpt2"))
    assert rc == 2                                  # unbuilt root


def test_ann_cli_stream_admit_string_ids(emb_paths, monkeypatch, capsys,
                                         spark, tmp_path):
    """--feed-schema carries string-id indexes through the stream gate
    (the default bigint schema would type-wedge the sink mid-stream)."""
    import os

    base = spark.read.parquet(str(emb_paths / "base")).selectExpr(
        "concat('v', vec_id) AS vec_id", "embedding")
    basep = str(tmp_path / "sbase")
    base.write.parquet(basep)
    root = str(tmp_path / "stridx")
    rc, _ = _run(capsys, "--root", root, "--build", basep,
                 "--n-centroids", "8")
    assert rc == 0

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    inc = spark.read.parquet(str(emb_paths / "inc")).selectExpr(
        "concat('v', vec_id) AS vec_id", "embedding")
    inc.coalesce(1).write.parquet(f"{feed}/s0")
    f = [x for x in os.listdir(f"{feed}/s0") if x.endswith(".parquet")][0]
    os.rename(f"{feed}/s0/{f}", f"{feed}/arrive-0.parquet")

    rc, out = _run(capsys, "--root", root, "--stream-admit", feed,
                   "--checkpoint", str(tmp_path / "ckpt"),
                   "--feed-schema", "vec_id string, embedding array<float>")
    assert rc == 0
    assert f"holds {inc.count()} vectors over 1 epochs" in out
    # query ids must share the index's id type (the self-pair exclusion
    # compares them; ANSI mode fails a string-vs-bigint cast loudly)
    qp = str(tmp_path / "sq")
    spark.read.parquet(str(emb_paths / "q")).selectExpr(
        "concat('v', vec_id) AS vec_id", "embedding").write.parquet(qp)
    rc, out = _run(capsys, "--root", root, "--search", qp,
                   "--k", "3", "--n-probe", "2")
    assert rc == 0 and "search: 30 result rows" in out
