"""Span-level exact substring dedup (duplicate_spans / strip_duplicate_spans,
Lee et al. ACL 2022 style) and Efraimidis-Spirakis weighted sampling."""

import math

import pytest
from pyspark.sql import Row, functions as F

from drift_detection_pibic___framework_spark.operators import dedup, sampling

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def tiny(spark):
    # doc 1: one passage repeated twice back-to-back, then unique tail;
    # doc 3: the SAME passage once (cross-doc dup); doc 2: fully unique
    return spark.createDataFrame([
        Row(doc_id=1, text="a b c d e a b c d e x y"),
        Row(doc_id=2, text="q w e r t y u i"),
        Row(doc_id=3, text="a b c d e z z q w"),
    ])


def _spans(df, **kw):
    return sorted(tuple(r) for r in dedup.duplicate_spans(df, **kw).collect())


def test_duplicate_spans_finds_and_merges(tiny):
    # L=3: flagged 3-gram starts {0,1,2} and {5,6,7} in doc 1 (gap 3 > L-1
    # breaks the island exactly where coverage stops overlapping), {0,1,2}
    # in doc 3; each island reported as one maximal [start, end] span
    assert _spans(tiny, L=3) == [
        (1, 0, 4, 3), (1, 5, 9, 3), (3, 0, 4, 3)]


def test_duplicate_spans_cross_doc_only(tiny):
    # within-doc repetition of "a b c d e" in doc 1 still surfaces because
    # doc 3 shares it; a gram repeated ONLY within one doc is dropped
    one_doc = tiny.filter("doc_id = 1")
    assert _spans(one_doc, L=3, cross_doc_only=True) == []
    both = _spans(tiny, L=3, cross_doc_only=True)
    assert (3, 0, 4, 3) in both and (1, 0, 4, 3) in both


def test_duplicate_spans_short_docs_skipped(spark):
    d = spark.createDataFrame([Row(doc_id=1, text="a b"),
                               Row(doc_id=2, text="a b")])
    assert _spans(d, L=3) == []          # sub-L docs contribute no grams
    assert _spans(d, L=2) == [(1, 0, 1, 1), (2, 0, 1, 1)]


def test_strip_removes_exactly_covered_tokens(tiny):
    out = {r["doc_id"]: r for r in
           dedup.strip_duplicate_spans(tiny, L=3)
           .select("doc_id", "text_clean", "n_tokens_removed").collect()}
    assert out[1]["text_clean"] == "x y" and out[1]["n_tokens_removed"] == 10
    assert out[2]["text_clean"] == "q w e r t y u i"
    assert out[2]["n_tokens_removed"] == 0
    assert out[3]["text_clean"] == "z z q w"
    assert out[3]["n_tokens_removed"] == 5


def test_strip_accepts_precomputed_spans(tiny):
    spans = dedup.duplicate_spans(tiny, L=3)
    a = dedup.strip_duplicate_spans(tiny, L=3).select(
        "doc_id", "text_clean").collect()
    b = dedup.strip_duplicate_spans(tiny, spans=spans).select(
        "doc_id", "text_clean").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_spans_on_fixture_corpus_hit_exact_dups(docs):
    # the documents fixture carries exact-dup groups: every member of a
    # group is wall-to-wall duplicated text, so span dedup must flag it
    # end-to-end (span covers the whole normalized token range)
    dup_ids = {r["doc_id"] for g in
               dedup.exact_duplicate_groups(docs).collect()
               for r in [g] for doc_id in g["doc_ids"]
               for r in [Row(doc_id=doc_id)]}
    spans = dedup.duplicate_spans(docs, L=8)
    toks = docs.select(
        "doc_id", F.size(F.split(dedup.norm_text("text"), " ")).alias("n"))
    full = (spans.join(toks, "doc_id")
            .filter((F.col("span_start") == 0)
                    & (F.col("span_end") == F.col("n") - 1)))
    covered = {r["doc_id"] for r in full.collect()}
    big_enough = {r["doc_id"] for r in
                  toks.filter(F.col("n") >= 8).collect()}
    assert (dup_ids & big_enough) <= covered


def _model_spans(texts: dict, L: int, min_count: int = 2) -> dict:
    """Brute-force python model of duplicate_spans: flag every gram
    position whose L-gram occurs >= min_count times corpus-wide, merge
    flagged positions into islands breaking where the gap exceeds L-1.
    Returns {doc_id: [(span_start, span_end, n_dup_grams)]}."""
    import re
    from collections import Counter
    toks = {i: re.sub(r"\s+", " ", t).strip().lower().split(" ")
            for i, t in texts.items()}
    grams: Counter = Counter()
    pos: dict = {}
    for i, tk in toks.items():
        pos[i] = []
        for p in range(len(tk) - L + 1):
            g = " ".join(tk[p:p + L])
            grams[g] += 1
            pos[i].append((p, g))
    out: dict = {}
    for i in pos:
        flagged = sorted(p for p, g in pos[i] if grams[g] >= min_count)
        spans = []
        for p in flagged:
            if spans and p - spans[-1][1] <= L - 1:
                spans[-1] = (spans[-1][0], p, spans[-1][2] + 1)
            else:
                spans.append((p, p, 1))
        out[i] = [(s, e + L - 1, c) for s, e, c in spans]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_duplicate_spans_differential_random_corpus(spark, seed):
    """Differential vs a brute-force python model over seeded random
    corpora from a small vocab (dense organic repeats): spans, island
    merges, and strip counts must all agree exactly."""
    import random
    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(12)]
    texts = {i: " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(2, 30)))
             for i in range(30)}
    L = 3
    want = _model_spans(texts, L)
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got: dict = {i: [] for i in texts}
    for r in dedup.duplicate_spans(df, L=L).collect():
        got[r["doc_id"]].append(
            (r["span_start"], r["span_end"], r["n_dup_grams"]))
    for i in texts:
        assert sorted(got[i]) == sorted(want[i]), f"doc {i} (seed {seed})"
    # strip consistency: tokens removed == |union of covered positions|
    removed = {r["doc_id"]: r["n_tokens_removed"] for r in
               dedup.strip_duplicate_spans(df, L=L)
               .select("doc_id", "n_tokens_removed").collect()}
    for i, spans in want.items():
        covered = set()
        for s, e, _ in spans:
            covered.update(range(s, e + 1))
        assert removed[i] == len(covered), f"doc {i} (seed {seed})"


# -- frequent-line (boilerplate) dedup ---------------------------------------

@pytest.fixture(scope="module")
def lined(spark):
    return spark.createDataFrame([
        Row(doc_id=1, text="unique content one\nsubscribe now\nmore text"),
        Row(doc_id=2, text="subscribe now\ndifferent body"),
        Row(doc_id=3, text="  subscribe now \n\nanother doc"),
        Row(doc_id=4, text="totally clean"),
    ])


def test_frequent_lines_counts_trimmed(lined):
    got = {r["line_norm"]: r["n_occurrences"] for r in
           dedup.frequent_lines(lined, min_count=3).collect()}
    # trim-normalized: doc 3's padded copy counts toward the same line
    assert got == {"subscribe now": 3}
    # empty lines never flagged regardless of frequency
    assert "" not in got


def test_strip_frequent_lines_preserves_order_and_rest(lined):
    out = {r["doc_id"]: r for r in
           dedup.strip_frequent_lines(lined, min_count=3)
           .select("doc_id", "text_clean", "n_lines_removed").collect()}
    assert out[1]["text_clean"] == "unique content one\nmore text"
    assert out[1]["n_lines_removed"] == 1
    assert out[2]["text_clean"] == "different body"
    # empty lines survive (formatting, not dedup); original spelling of
    # non-flagged lines is preserved byte-for-byte
    assert out[3]["text_clean"] == "\nanother doc"
    assert out[4]["text_clean"] == "totally clean"
    assert out[4]["n_lines_removed"] == 0


def test_strip_frequent_lines_all_boilerplate_doc(spark):
    d = spark.createDataFrame(
        [Row(doc_id=i, text="the same banner") for i in range(3)])
    out = dedup.strip_frequent_lines(d, min_count=3).collect()
    assert all(r["text_clean"] == "" and r["n_lines_removed"] == 1
               for r in out)


def test_line_index_incremental_equals_full_recount(spark, tmp_path):
    """Two batches added to the LineIndex must fold to exactly the counts
    a single full-corpus frequent_lines pass computes — and a line that
    only crosses min_count ACROSS batches is flagged (the case an
    increment-local count would miss)."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    b1 = spark.createDataFrame([
        Row(doc_id=1, text="banner line\nbody one"),
        Row(doc_id=2, text="banner line\nbody two")])
    b2 = spark.createDataFrame([
        Row(doc_id=3, text="banner line\nbody three"),
        Row(doc_id=4, text="  banner line \nbody four")])
    idx = dedup.LineIndex(ParquetTableIO(str(tmp_path)))
    idx.add(b1)
    idx.add(b2)
    got = {r["line_norm"]: r["n_occurrences"]
           for r in idx.flagged(spark, min_count=3).collect()}
    full = b1.unionByName(b2)
    want = {r["line_norm"]: r["n_occurrences"]
            for r in dedup.frequent_lines(full, min_count=3).collect()}
    assert got == want == {"banner line": 4}
    # neither batch alone reaches min_count=3... (2 + 2 across batches)
    assert not dedup.frequent_lines(b1, min_count=3).collect()
    # and the folded index drives the strip exactly like a full recount
    a = sorted(tuple(r) for r in dedup.strip_frequent_lines(
        full, min_count=3, lines=idx.flagged(spark, 3))
        .select("doc_id", "text_clean").collect())
    b = sorted(tuple(r) for r in dedup.strip_frequent_lines(
        full, min_count=3).select("doc_id", "text_clean").collect())
    assert a == b


def test_gram_index_incremental_spans(spark, tmp_path):
    """An increment's spans against the indexed history: a passage first
    seen in batch 1 and repeated in batch 2 flags batch 2's occurrence;
    a batch-2-only passage does not; full-corpus counts equal a one-shot
    duplicate_spans run; compact preserves the fold."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    b1 = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps high today")])
    b2 = spark.createDataFrame([
        Row(doc_id=2, text="intro words the quick brown fox jumps high"),
        Row(doc_id=3, text="completely unrelated fresh content here")])
    idx = dedup.GramIndex(ParquetTableIO(str(tmp_path)), L=3)
    idx.add(b1)
    idx.add(b2)
    got = sorted(tuple(r) for r in idx.spans(b2).collect())
    # doc 2 repeats b1's 6-token passage "the quick brown fox jumps
    # high" at tokens 2-7: flagged 3-gram starts {2,3,4,5} -> span [2,7]
    assert got == [(2, 2, 7, 4)]
    # strip through the index spans removes exactly that passage
    out = {r["doc_id"]: r for r in dedup.strip_duplicate_spans(
        b2, spans=idx.spans(b2)).select(
        "doc_id", "text_clean", "n_tokens_removed").collect()}
    assert out[2]["text_clean"] == "intro words"
    assert out[2]["n_tokens_removed"] == 6
    assert out[3]["n_tokens_removed"] == 0
    # one-shot parity on the union (both occurrences flagged there)
    both = dedup.duplicate_spans(b1.unionByName(b2), L=3)
    assert {r["doc_id"] for r in both.collect()} == {1, 2}
    # compact: folded index yields identical spans
    idx.compact(spark)
    assert sorted(tuple(r) for r in idx.spans(b2).collect()) == got


def test_line_index_compact_preserves_counts(spark, tmp_path):
    """compact() folds N partial commits into one rewrite; flagged()
    before and after must be identical, further adds still merge, and
    the commit log restarts at the rewrite."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    io = ParquetTableIO(str(tmp_path))
    idx = dedup.LineIndex(io)
    for k in range(3):
        idx.add(spark.createDataFrame(
            [Row(doc_id=k * 10 + j, text="banner\nbody %d-%d" % (k, j))
             for j in range(2)]))
    before = sorted(map(tuple, idx.flagged(spark, 2).collect()))
    idx.compact(spark)
    after = sorted(map(tuple, idx.flagged(spark, 2).collect()))
    assert before == after == [("banner", 6)]
    # membership restarted at the rewrite: exactly one live commit
    live = [e for e in io.snapshots(idx.TABLE) if not e["orphaned"]]
    assert len(live) == 1 and live[0].get("kind") == "rewrite"
    # post-compact adds keep merging on top of the folded state
    idx.add(spark.createDataFrame([Row(doc_id=99, text="banner")]))
    got = {r["line_norm"]: r["n_occurrences"]
           for r in idx.flagged(spark, 2).collect()}
    assert got["banner"] == 7


def test_streaming_reservoir_equals_batch_sample(spark, tmp_path):
    """The streamed reservoir after draining N micro-batches must equal
    the one-shot weighted_sample over the concatenated stream (the A-Res
    reservoir property), and a checkpoint-replayed restart must leave it
    unchanged."""
    import os

    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    from drift_detection_pibic___framework_spark.streaming import (
        stream_sample)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    all_rows = []
    for c in range(3):
        rows = [Row(doc_id=c * 100 + j, w=float(1 + (c * 100 + j) % 7))
                for j in range(40)]
        all_rows += rows
        (spark.createDataFrame(rows).coalesce(1)
         .write.parquet(str(tmp_path / f"stage{c}")))
        src = next(p for p in (tmp_path / f"stage{c}").iterdir()
                   if p.name.endswith(".parquet"))
        dst = in_dir / f"{c:02d}.parquet"
        src.rename(dst)
        os.utime(dst, (1e9 + c, 1e9 + c))

    root, ckpt = str(tmp_path / "r"), str(tmp_path / "c")
    q = stream_sample.run_weighted_reservoir_stream(
        spark, str(in_dir), "doc_id long, w double", root, ckpt,
        k=15, weight_col="w")
    assert q.awaitTermination(300)

    io = ParquetTableIO(root)
    got = {r["doc_id"] for r in
           io.read_appended(spark, stream_sample.RESERVOIR_TABLE)
           .collect()}
    want = {r["doc_id"] for r in sampling.weighted_sample(
        spark.createDataFrame(all_rows), "w", 15).collect()}
    assert got == want and len(got) == 15

    # restart on the same checkpoint: no new epochs, reservoir unchanged
    q2 = stream_sample.run_weighted_reservoir_stream(
        spark, str(in_dir), "doc_id long, w double", root, ckpt,
        k=15, weight_col="w")
    assert q2.awaitTermination(300)
    again = {r["doc_id"] for r in
             io.read_appended(spark, stream_sample.RESERVOIR_TABLE)
             .collect()}
    assert again == want


# -- weighted sampling ------------------------------------------------------

def test_weighted_sample_matches_reference(spark):
    import hashlib
    rows = [Row(doc_id=i, w=float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows)
    got = sampling.weighted_sample(df, "w", 25, key_col="doc_id")
    ids = {r["doc_id"] for r in got.collect()}

    def key(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5) \
            / 2 ** 32
        return math.log(u) / w
    want = {i for i, _ in sorted(((r.doc_id, key(r.doc_id, r.w))
                                  for r in rows),
                                 key=lambda t: -t[1])[:25]}
    assert ids == want


def test_weighted_sample_is_weight_sensitive(spark):
    # same keys, but one heavy row: weight >> others must (for this md5
    # draw) push the heavy row into a small sample
    df = spark.createDataFrame(
        [Row(doc_id=i, w=1000.0 if i == 42 else 1.0) for i in range(100)])
    ids = {r["doc_id"] for r in
           sampling.weighted_sample(df, "w", 5, key_col="doc_id").collect()}
    assert 42 in ids


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, w=0.0), Row(doc_id=2, w=-1.0), Row(doc_id=3, w=2.0)])
    ids = {r["doc_id"] for r in
           sampling.weighted_sample(df, "w", 10, key_col="doc_id").collect()}
    assert ids == {3}


def test_strip_spans_aligns_on_nonspace_whitespace(spark):
    """Leading tab / trailing newline: F.trim strips only ASCII spaces, so
    a merely-trimmed raw \\s+ split emitted a phantom empty token and
    shifted every span offset by one — deleting the wrong tokens (r5
    review).  The raw stream now mirrors norm_text's collapse-then-trim
    pipeline, so a doc with edge whitespace strips identically to its
    clean twin."""
    body = "the cat sat on the mat then the cat sat on the mat"
    df = spark.createDataFrame([
        Row(doc_id=1, text="\t" + body + "\n"),
        Row(doc_id=2, text=body),
    ])
    out = {r.doc_id: r for r in dedup.strip_duplicate_spans(
        df, L=3, min_count=2).collect()}
    assert out[1].text_clean == out[2].text_clean
    assert out[1].n_tokens_removed == out[2].n_tokens_removed > 0


def test_raw_token_stream_matches_norm_count(spark):
    """The strip contract 'normalization never changes the token COUNT'
    must hold for every whitespace shape, including tabs/newlines at the
    edges and all-whitespace docs."""
    from drift_detection_pibic___framework_spark.operators import text as T
    df = spark.createDataFrame(
        [(1, "\tfoo  bar\n"), (2, " x "), (3, "a\nb\tc"), (4, ""),
         (5, " \t\n ")], "doc_id long, text string")
    rows = df.select(
        F.size(T.tokens("text")).alias("raw"),
        F.size(F.split(dedup.norm_text("text"), " ")).alias("norm")
    ).collect()
    assert all(r.raw == r.norm for r in rows)
