"""Training-data pipeline operators: dedup family, similarity search,
text analysis, salted sketch aggregation, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from drift_detection_pibic___framework_spark.operators import (
    dedup, multimodal, similarity, sketch_agg, text)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# -- exact dedup ----------------------------------------------------------

def test_exact_dedup_finds_injected_dups(spark, docs):
    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    with_dups = docs.unionByName(dup)
    groups = dedup.exact_duplicate_groups(with_dups).collect()
    assert len(groups) == 3
    for g in groups:
        assert g["n_docs"] == 2
        assert g["canonical_doc_id"] == min(g["doc_ids"])


def test_exact_dedup_normalizes_whitespace(spark):
    d = spark.createDataFrame([
        Row(doc_id=1, text="hello   world"),
        Row(doc_id=2, text="  hello world  "),
        Row(doc_id=3, text="HELLO WORLD"),
        Row(doc_id=4, text="different"),
    ])
    g = dedup.exact_duplicate_groups(d).collect()
    assert len(g) == 1 and sorted(g[0]["doc_ids"]) == [1, 2, 3]


# -- minhash / LSH ---------------------------------------------------------

def test_minhash_signature_deterministic(spark, docs):
    a = dedup.minhash_signatures(docs.limit(20)).collect()
    b = dedup.minhash_signatures(docs.limit(20)).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """Every exact-Jaccard>=0.5 pair must be recovered by the LSH pipeline
    (16 hashes x 8 bands => catch prob ~1 at j>=0.5)."""
    base = docs.limit(40)
    near = (base.limit(6)
            .withColumn("doc_id", F.col("doc_id") + 200000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" extra tail word"))))
    d = base.unionByName(near)
    found = {(r["doc_a"], r["doc_b"]) for r in
             dedup.minhash_near_duplicates(
                 d, threshold=0.5, num_hashes=16, bands=8).collect()}
    ids = d.select("doc_id")
    pairs = (ids.alias("a").crossJoin(ids.alias("b"))
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b")))
    exact = {(r["doc_a"], r["doc_b"]) for r in
             dedup.jaccard_pairs(d, pairs).filter("jaccard >= 0.5").collect()}
    assert exact, "fixture must contain near-dup pairs"
    assert exact <= found


def test_jaccard_identical_docs_is_one(spark):
    d = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f"),
        Row(doc_id=2, text="a b c d e f"),
        Row(doc_id=3, text="x y z w q r")])
    pairs = spark.createDataFrame([Row(doc_a=1, doc_b=2), Row(doc_a=1, doc_b=3)])
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.jaccard_pairs(d, pairs).collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == 0.0


# -- simhash ---------------------------------------------------------------

def test_simhash_hamming_small_for_near_dups(spark):
    d = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(f"w{i}" for i in range(60))),
        Row(doc_id=2, text=" ".join(f"w{i}" for i in range(59)) + " tail"),
        Row(doc_id=3, text=" ".join(f"zz{i}" for i in range(60)))])
    pairs = dedup.simhash_near_duplicates(d, max_hamming=16).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert (1, 2) in got
    assert got[(1, 2)] <= 10
    assert (1, 3) not in got


def test_simhash_candidate_recall_guaranteed(spark, docs):
    """Every pair within the requested Hamming radius must be found: the
    chunk count is derived as max_hamming+1 (pigeonhole), so no pair can
    differ in all chunks (ADVICE r1: fixed 4 chunks lost radius>3 pairs)."""
    radius = 10
    base = docs.limit(25)
    variant = (base.limit(8)
               .withColumn("doc_id", F.col("doc_id") + 300000)
               .withColumn("text", F.concat(F.col("text"), F.lit(" tail"))))
    d = base.unionByName(variant)
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(d).collect()}
    expect = {(a, b) for a in sh for b in sh if a < b
              and bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= radius}
    found = {(r["doc_a"], r["doc_b"]) for r in
             dedup.simhash_near_duplicates(d, max_hamming=radius).collect()}
    assert expect, "fixture must contain pairs within the radius"
    assert found == expect
    with pytest.raises(ValueError):
        dedup.simhash_near_duplicates(d, max_hamming=64)


def test_spread_parallelizes_narrow_scans(spark, docs):
    """_spread (optimization r6) must repartition a sub-parallelism input
    up to the cluster's default parallelism — a one-file corpus otherwise
    runs the whole md5 signature pass on one core — and must be a no-op
    on an input that is already spread (no gratuitous shuffle)."""
    one = docs.limit(20).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    spread = dedup._spread(one)
    assert (spread.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)
    wide = docs.limit(20).repartition(
        spark.sparkContext.defaultParallelism)
    assert dedup._spread(wide) is wide


def test_minhash_restriction_changes_no_pairs(spark, docs):
    """The candidate-member semi-join restriction (optimization r6) must
    not change a single output pair: the verify phase sees every doc that
    appears in a candidate pair, so the pair set is identical to the
    unrestricted pipeline's (cross-checked against direct all-pairs
    Jaccard over the same docs at the same threshold)."""
    d = docs.limit(40)
    got = {(r.doc_a, r.doc_b, r.jaccard)
           for r in dedup.minhash_near_duplicates(
               d, threshold=0.2, num_hashes=16, bands=8).collect()}
    ids = d.select("doc_id")
    allp = (ids.alias("a").crossJoin(ids.alias("b"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b")))
    want = {(r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.jaccard_pairs(d, allp)
            .filter("jaccard >= 0.2").collect()}
    # LSH may miss pairs below its recall curve but must never invent
    # one; on this fixture at 16x8 banding recall is total
    assert got == want


def test_minhash_pipeline_releases_caches(spark, docs):
    """minhash_near_duplicates must not leave intermediate caches pinned:
    only the returned (small) result is cached, and unpersisting it drops
    exactly that entry (VERDICT r1 wrong #5).  Asserted on registry-id
    DELTAS, not global counts: the ContextCleaner may evict released
    caches from earlier test modules at any moment, so absolute counts
    flake under the full suite."""
    docs.count()                    # pin the module fixture's own cache

    def ids():
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        lst = m.toList()
        return {lst.apply(i)._1() for i in range(m.size())}

    before = ids()
    res = dedup.minhash_near_duplicates(docs.limit(30), threshold=0.2)
    added = ids() - before
    assert len(added) == 1          # the result, and ONLY the result
    res.unpersist(blocking=True)
    assert not (added & ids())      # and it is gone


# -- similarity search -----------------------------------------------------

def test_brute_force_topk_matches_numpy(spark, emb):
    got = similarity.brute_force_topk(
        emb, emb.filter("vec_id < 3"), k=4).toPandas()
    pdf = emb.toPandas()
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    for q in range(3):
        qi = np.where(ids == q)[0][0]
        cos = V @ V[qi] / (np.linalg.norm(V, axis=1) * np.linalg.norm(V[qi]))
        cos_r = np.round(cos, 4)
        order = sorted([(float(-cos_r[i]), int(ids[i])) for i in range(len(ids))
                        if ids[i] != q])[:4]
        want = [i for _, i in order]
        have = got[got.query_id == q].sort_values("rank")["nbr_id"].tolist()
        assert have == want, q


def test_lsh_knn_recall(spark, emb):
    """Multi-probe hyperplane LSH must recover >= 60% of true top-5
    neighbors on the fixture (recall measured, not assumed)."""
    exact = similarity.brute_force_topk(emb, emb, k=5).toPandas()
    approx = similarity.hyperplane_lsh_neighbors(emb, k=5).toPandas()
    e = {(r.query_id, r.nbr_id) for r in exact.itertuples()}
    a = {(r.query_id, r.nbr_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall


def test_ivf_join_is_equi_not_cartesian(spark, emb):
    """The IVF search join must plan as an equi join on ivf_cell — never a
    cartesian product (that would be brute force with extra steps)."""
    plan = (similarity.ivf_topk(emb, emb.limit(20), k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "ivf_cell" in plan


def test_ivf_wide_quantizer_analysis_bounded(spark, emb):
    """Production ANN widths (256 centroids x 64 dims here; 4096x768 in
    the wild) must not blow up Catalyst analysis: the quantizer enters the
    plan as ONE folded nested-array literal, so analysis + optimization of
    cell assignment completes in bounded time (the r3 per-centroid scalar
    literal trees made this super-linear in n_centroids — VERDICT r3
    wrong #2)."""
    import time as _time

    def _analyze_sec(n_centroids: int) -> tuple:
        C = similarity.random_unit_centroids(64, n_centroids, seed=7)
        t0 = _time.time()
        df = similarity.with_ivf_cell(emb, C)
        _ = df.schema                   # analysis
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        return _time.time() - t0, df, opt

    # warm the analyzer once so JIT/classloading doesn't land in the
    # baseline, then pin the GROWTH, not the wall clock: an absolute
    # bound flakes under this sandbox's page-throttle episodes, while
    # the regression this guards (r3's per-centroid scalar trees) made
    # analysis super-linear in n_centroids — a 16x width step exploded
    # far beyond 20x the narrow time.  Both legs run in the same
    # throttle window, so the ratio is robust where wall clock is not.
    _analyze_sec(16)
    narrow, _, _ = _analyze_sec(16)
    dt, df, opt = _analyze_sec(256)
    assert dt < max(20 * narrow, 15), (
        f"analysis at 256x64 took {dt:.1f}s vs {narrow:.2f}s at 16x64")
    # the quantizer is constant-folded: no per-centroid array() builders
    # survive into the optimized plan
    assert opt.count("array(") <= 2, opt[:2000]
    # and it still computes a valid cell per row
    cells = df.select("ivf_cell").distinct().collect()
    assert all(0 <= r.ivf_cell < 256 for r in cells)

    # LSH signature path: same hardening, 16 planes x 64 dims
    P = similarity.hyperplanes(64, n_planes=16, seed=7)
    t0 = _time.time()
    sig_df = similarity.with_lsh_signature(emb, P)
    _ = sig_df.schema
    assert _time.time() - t0 < max(20 * narrow, 15)
    n_buckets = sig_df.select("lsh_bucket").distinct().count()
    assert 1 <= n_buckets <= 1 << 16


def test_simhash_kernel_parity(spark, docs):
    """The single-pass Arrow kernel must reproduce the 64-pass expression
    form bit-for-bit over the whole fixture corpus plus adversarial rows
    (empty text, whitespace runs, null, sign-bit-heavy tokens)."""
    adversarial = spark.createDataFrame(
        [(900001, ""), (900002, "   "), (900003, "a"),
         (900004, "Tabs\tand\nnewlines  collapse THE same WAY"),
         (900005, None),
         (900006, "repeated repeated repeated token token")],
        "doc_id long, text string")
    corpus = docs.select("doc_id", "text").unionByName(adversarial)
    expr = {r.doc_id: r.simhash for r in dedup.simhash(corpus).collect()}
    kern = {r.doc_id: r.simhash
            for r in dedup.simhash_kernel(corpus).collect()}
    assert expr == kern
    # the vectorized hot path (JVM token hashing + Arrow bit-fold) must
    # match both bit-for-bit too
    fold = {r.doc_id: r.simhash
            for r in dedup.simhash_fold(corpus).collect()}
    assert expr == fold
    # memory-bounded slicing: a tiny fold_cap forces many sub-slices AND
    # longer-than-cap single documents through the capped reduceat path —
    # arithmetic must stay bit-identical to the one-shot fold
    capped = {r.doc_id: r.simhash
              for r in dedup.simhash_fold(corpus, fold_cap=3).collect()}
    assert expr == capped
    # expression-form quirk all three must share: null text packs to 0
    # (per-bit when(NULL > 0).otherwise(0) falls through), not NULL
    assert expr[900005] == 0
    # the hot-path switch yields identical near-dup pairs
    sub = docs.limit(60)
    pairs_e = {(r.doc_a, r.doc_b) for r in dedup.simhash_near_duplicates(
        sub, max_hamming=10).collect()}
    pairs_k = {(r.doc_a, r.doc_b) for r in dedup.simhash_near_duplicates(
        sub, max_hamming=10, use_kernel=True).collect()}
    assert pairs_e == pairs_k


def test_simhash_candidate_join_is_equi(spark, docs):
    """SimHash near-dup candidates come from an equi join on
    (chunk_idx, chunk_val) — no cross join at any radius."""
    plan = (dedup.simhash_near_duplicates(docs.limit(30), max_hamming=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan


def test_ivf_knn_recall_and_candidate_bound(spark, emb):
    """IVF ANN: n_probe/n_centroids cells per query bound the candidate
    set, and recall vs brute-force top-5 must still be >= 60%."""
    exact = similarity.brute_force_topk(emb, emb, k=5).toPandas()
    approx = similarity.ivf_topk(emb, emb, k=5,
                                 n_centroids=16, n_probe=5).toPandas()
    e = {(r.query_id, r.nbr_id) for r in exact.itertuples()}
    a = {(r.query_id, r.nbr_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall
    # every vector lands in exactly one cell; cells partition the corpus
    C = similarity.ivf_fit_centroids(emb, 16)
    cells = similarity.with_ivf_cell(
        emb.selectExpr("vec_id", "embedding as nv"), C, "nv").toPandas()
    assert cells["ivf_cell"].between(0, 15).all()
    assert len(cells) == emb.count()


# -- semantic dedup (SemDeDup) ----------------------------------------------

@pytest.fixture(scope="module")
def sem_emb(spark):
    """12 well-separated base vectors + near-copies of the first three:
    two copies of #0 (a chain through the group) and one copy each of
    #1, #2 — known group structure for SemDeDup assertions."""
    rng = np.random.default_rng(4242)
    base = rng.normal(0.0, 1.0, (12, 16))
    rows = [Row(vec_id=i, embedding=[float(x) for x in v])
            for i, v in enumerate(base)]
    for j, src in enumerate([0, 0, 1, 2]):
        near = base[src] + rng.normal(0.0, 0.01, 16)
        rows.append(Row(vec_id=100 + j,
                        embedding=[float(x) for x in near]))
    return spark.createDataFrame(rows).cache()


def test_semantic_dedup_drops_noncanonical(spark, sem_emb):
    """semantic_dedup keeps exactly one (min-id) member per near-dup
    group and every unduplicated vector."""
    C = similarity.random_unit_centroids(16, 4, seed=1)
    kept = sorted(r.vec_id for r in similarity.semantic_dedup(
        sem_emb, centroids=C, threshold=0.99).collect())
    # dropped: the four injected copies (101 joins 0's group via 100)
    assert kept == list(range(12))


def test_semantic_dup_groups_structure(spark, sem_emb):
    """Group closure: {0,100,101} collapse into one component with
    canonical 0 even if 100-101 is the only strong edge to 101."""
    C = similarity.random_unit_centroids(16, 4, seed=1)
    groups = {r.component: r for r in similarity.semantic_dup_groups(
        sem_emb, C, threshold=0.99).collect()}
    assert set(groups) == {0, 1, 2}
    assert groups[0].members == "0,100,101"
    assert groups[0].n_members == 3
    assert groups[1].members == "1,102"
    assert groups[2].members == "2,103"


def test_semantic_pairs_join_is_equi_on_cell(spark, sem_emb):
    """The candidate join must be equi on ivf_cell — never a cartesian
    product (cross-cell pairs are out of scope by design)."""
    C = similarity.random_unit_centroids(16, 4, seed=1)
    plan = (similarity.semantic_dup_pairs(sem_emb, C, 0.99)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "ivf_cell" in plan


def test_semantic_dedup_fitted_quantizer(spark, emb):
    """The default (fitted k-means) quantizer path runs end-to-end and
    only ever removes rows (never invents or duplicates survivors)."""
    out = similarity.semantic_dedup(emb, threshold=0.999)
    n_in, n_out = emb.count(), out.count()
    assert n_out <= n_in
    assert out.select("vec_id").distinct().count() == n_out


# -- text ops --------------------------------------------------------------

def test_token_counts_simple(spark):
    d = spark.createDataFrame([Row(doc_id=1, text="  one two  three ")])
    r = text.with_token_counts(d).collect()[0]
    assert r["n_tokens"] == 3


def test_quality_score_bounds(spark, docs):
    q = text.with_quality(docs).toPandas()
    assert ((q["quality_score"] >= 0) & (q["quality_score"] <= 1)).all()
    assert ((q["alpha_ratio"] >= 0) & (q["alpha_ratio"] <= 1)).all()


def test_lang_scores_pick_stopword_language(spark):
    d = spark.createDataFrame([
        Row(doc_id=1, text="the cat and the dog of the house is it"),
        Row(doc_id=2, text="el perro y la casa de que un es en dia")])
    out = {r["doc_id"]: r["predicted_lang"]
           for r in text.with_lang_scores(d).collect()}
    assert out[1] == "en" and out[2] == "es"


def test_strip_markup_hand_cases(spark):
    d = spark.createDataFrame([
        Row(doc_id=1, text='<div class="a"><p>hi &amp; lo</p></div>'),
        Row(doc_id=2, text="no markup at all"),
        # &amp;lt; must decode ONE level (to "&lt;"), never to "<"
        Row(doc_id=3, text="x &amp;lt; y"),
        Row(doc_id=4, text="a<br/>b  c&nbsp;&nbsp;d")])
    out = {r.doc_id: r for r in text.strip_markup(d).collect()}
    assert out[1].stripped_text == "hi & lo" and out[1].n_tags == 4
    assert out[2].stripped_text == "no markup at all"
    assert out[2].n_tags == 0 and out[2].markup_ratio == 0.0
    assert out[3].stripped_text == "x &lt; y"
    assert out[4].stripped_text == "a b c d" and out[4].n_tags == 1
    assert 0 < out[1].markup_ratio < 1


def test_bigram_lm_hand_computed(spark):
    """Add-one-smoothed bigram LM on a 1-doc corpus, scored on itself:
    corpus 'a b a b' has bigrams (a,b)x2 (b,a)x1, contexts a=2 b=1,
    vocab {a,b} -> logp(a,b)=ln(3/4), logp(b,a)=ln(2/3)."""
    import math
    d = spark.createDataFrame([Row(doc_id=1, text="a b a b")])
    model = text.train_bigram_lm(d)
    c12, c1, v = model
    assert v == 2
    assert {(r.w1, r.w2): r.c12 for r in c12.collect()} == {
        ("a", "b"): 2, ("b", "a"): 1}
    r = text.lm_score(d, model).collect()[0]
    expect = (2 * round(math.log(3 / 4) * 1e6) +
              round(math.log(2 / 3) * 1e6)) / 1e6 / 3
    assert r.n_bigrams == 3
    assert r.avg_logp == round(expect, 6)
    assert r.ppl == round(math.exp(-r.avg_logp), 4)


def test_bigram_lm_unseen_falls_back_smoothed(spark):
    """Held-out text with unseen bigrams/contexts scores through the
    smoothed floor (ln(1/V) for an unseen context) instead of erroring,
    and scores BELOW in-distribution text."""
    import math
    train = spark.createDataFrame(
        [Row(doc_id=i, text="the cat sat on the mat") for i in range(5)])
    model = text.train_bigram_lm(train)
    v = model[2]
    held = spark.createDataFrame([
        Row(doc_id=10, text="the cat sat"),      # in-distribution
        Row(doc_id=11, text="zz qq zz qq zz"),   # fully unseen
        Row(doc_id=12, text="one")])             # < 2 tokens: no evidence
    out = {r.doc_id: r for r in text.lm_score(held, model).collect()}
    assert 12 not in out
    assert out[11].avg_logp == round(math.log(1 / v), 6)
    assert out[10].avg_logp > out[11].avg_logp


def test_bigram_lm_min_count_prunes_model(spark):
    d = spark.createDataFrame([Row(doc_id=1, text="a b a b c d")])
    c12, _, _ = text.train_bigram_lm(d, min_count=2)
    assert {(r.w1, r.w2) for r in c12.collect()} == {("a", "b")}


def test_strip_markup_differential_random_batch(spark):
    """One seeded random tag-soup batch (partial tags, entity chains,
    unicode) against an independent python reference of the spec: tags
    stripped BEFORE entity decode (so decoded ``&lt;`` is content and may
    legally form ``<>`` in the output — caught designing this test),
    amp-last decode, ASCII whitespace collapse.  Plus the structural
    invariants: whitespace-canonical, never grows, ratio in [0, 1]."""
    import re
    rng = np.random.default_rng(77)
    frags = ["<p>", "</p>", '<a href="u?x=1&amp;y=2">', "<br/>", "<",
             ">", "&amp;", "&lt;", "&nbsp;", "&amp;lt;", "wörd", "x y",
             "  ", "tab\tchar", "€", "plain"]
    rows = [Row(doc_id=i,
                text="".join(rng.choice(frags, rng.integers(1, 12))))
            for i in range(200)]

    def ref(t: str) -> str:
        s = re.sub(r"<[^>]*>", " ", t)
        for ent, rep in text.HTML_ENTITIES:
            s = s.replace(ent, rep)
        return re.sub(r"\s+", " ", s, flags=re.ASCII).strip(" ")

    out = text.strip_markup(spark.createDataFrame(rows)).collect()
    assert len(out) == 200
    for r in out:
        orig = rows[r.doc_id].text
        assert r.stripped_text == ref(orig), orig
        s = r.stripped_text
        assert s == s.strip(" ") and "  " not in s and "\t" not in s
        assert len(s) <= len(orig)
        assert 0.0 <= r.markup_ratio <= 1.0


def test_lm_score_invariants_random_batch(spark):
    """Self-trained scoring over a seeded random corpus: every smoothed
    bigram probability is < 1, so avg_logp < 0 and ppl > 1; scoring the
    training corpus itself covers every doc with >= 2 tokens."""
    rng = np.random.default_rng(88)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    rows = [Row(doc_id=i,
                text=" ".join(rng.choice(vocab, rng.integers(1, 30))))
            for i in range(150)]
    d = spark.createDataFrame(rows)
    out = text.lm_score(d, text.train_bigram_lm(d)).collect()
    expected = sum(1 for r in rows if len(r.text.split()) >= 2)
    assert len(out) == expected
    for r in out:
        assert r.avg_logp < 0 and r.ppl > 1
        assert r.n_bigrams == len(rows[r.doc_id].text.split()) - 1


def test_repetition_metrics_hand_counted(spark):
    """Hand-counted Gopher-style repetition fractions, including the
    (count, chars) tie-break on the top 2-gram and a fully self-repeating
    doc whose duplicate-5-gram fraction must be exactly 1."""
    d = spark.createDataFrame([
        # tokens [aa bb aa bb aa cc]: top word aa 3/6; 2-grams
        # {aa bb:2, bb aa:2, aa cc:1} -> top coverage 2*5/25; both
        # 5-grams unique -> dup frac 0
        Row(doc_id=1, text="aa bb aa bb aa cc"),
        # [xx yy]*4: top word 4/8; 2-grams {xx yy:4, yy xx:3} ->
        # 20/35; all four 5-grams occur twice -> dup frac 1
        Row(doc_id=2, text="xx yy xx yy xx yy xx yy")])
    out = {r.doc_id: r for r in text.repetition_metrics(d).collect()}
    assert out[1].top_word_frac == 0.5
    assert out[1].top_2gram_char_frac == 0.4
    assert out[1].dup_5gram_char_frac == 0.0
    assert out[2].top_word_frac == 0.5
    assert out[2].top_2gram_char_frac == round(20 / 35, 6)
    assert out[2].dup_5gram_char_frac == 1.0


def test_fingerprint_stable_under_whitespace(spark):
    d = spark.createDataFrame([
        Row(doc_id=1, text="alpha  beta\tgamma delta"),
        Row(doc_id=2, text="alpha beta gamma delta")])
    fp = text.with_fingerprints(d).collect()
    assert fp[0]["md5_fingerprint"] == fp[1]["md5_fingerprint"]
    assert fp[0]["min_shingle_hash"] == fp[1]["min_shingle_hash"]


# -- salted sketches -------------------------------------------------------

def test_salted_equals_unsalted(spark, clips):
    """Property: salting must not change the merged sketch's estimates
    (merge is order-insensitive up to compaction randomness — quantiles
    agree within sketch tolerance, n exactly)."""
    salted = sketch_agg.salted_group_kll(clips, "codec", "dur_ms", n_salts=8)
    plain = sketch_agg.unsalted_group_kll(clips, "codec", "dur_ms")
    assert set(salted) == set(plain)
    for k in salted:
        assert salted[k].n == plain[k].n
        qs = np.array([0.25, 0.5, 0.75])
        a, b = salted[k].quantile(qs), plain[k].quantile(qs)
        assert np.all(np.abs(a - b) / np.maximum(b, 1) < 0.05), k


def test_salted_kll_accuracy_vs_exact(spark, clips, duck):
    got = sketch_agg.group_quantiles(clips, "codec", "dur_ms")
    want = duck.sql("""
        select codec, quantile_disc(dur_ms, 0.5) p50 from clips
        group by codec""").df().set_index("codec")["p50"]
    for _, r in got.iterrows():
        assert abs(r["p50"] - want[r["key"]]) / want[r["key"]] < 0.05


def test_salted_kll_high_key_cardinality(spark):
    """Stage-2 merge happens on executors: with >=1000 distinct keys the
    driver receives one final sketch per key, and per-key n / median are
    exact for the uniform per-key streams (VERDICT r1 wrong #3)."""
    n_keys, per_key = 1200, 40
    pdf = __import__("pandas").DataFrame({
        "rid": np.arange(n_keys * per_key),
        "g": np.repeat(np.arange(n_keys), per_key),
        "v": np.tile(np.arange(per_key, dtype=np.float64), n_keys)})
    df = spark.createDataFrame(pdf)
    out = sketch_agg.salted_group_kll(df, "g", "v", n_salts=4, k=64)
    assert len(out) == n_keys
    for key in ("0", "599", "1199"):
        assert out[key].n == per_key
        assert 0 <= out[key].quantile(0.5) <= per_key - 1


def test_tree_aggregate_kll(spark, clips, duck):
    sk = sketch_agg.tree_aggregate_kll(clips, "dur_ms")
    exact = duck.sql("select quantile_disc(dur_ms, 0.5), count(*) from clips").fetchone()
    assert sk.n == exact[1]
    assert abs(sk.quantile(0.5) - exact[0]) / exact[0] < 0.05


# -- multimodal ------------------------------------------------------------

def test_audio_features_shapes_and_ranges(spark, clips):
    f = multimodal.audio_features(clips.filter("part = 0")).toPandas()
    assert len(f) == clips.filter("part = 0").count()
    assert ((f["rms"] > 0.1) & (f["rms"] < 0.4)).all()      # 0.3 sine + noise
    assert (f["spectral_centroid_hz"] > 0).all()
    assert (f["spectral_centroid_hz"] <= 1000).all()        # store rate/2


def test_image_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", "png")
    fake = multimodal.decode_image_fake(b"\x01" * 300, "png")
    assert fake.shape == (8, 8, 3) and fake.dtype == np.uint8


def test_frame_sampling_shape():
    pcm = np.arange(1000, dtype=np.int16)
    frames = multimodal.frame_sample(pcm, frame_len=100, every_k=2)
    assert frames.shape == (5, 100)
    assert frames[0][0] == 0 and frames[1][0] == 200


def test_audio_features_match_per_row_reference(spark, clips):
    """The vectorized (reduceat) feature kernel must match a per-row
    reference computation exactly (same rounding)."""
    import numpy as np
    from drift_detection_pibic___framework_spark.functions import audio
    sub = clips.filter("part = 1").limit(100)
    got = multimodal.audio_features(sub).toPandas().set_index("rid")
    pdf = sub.select("rid", "bytes", "codec").toPandas()
    for _, r in pdf.iterrows():
        pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
        rms = round(float(np.sqrt(np.mean(pcm ** 2))), 6)
        zcr = round(float(np.mean(np.abs(np.diff(np.signbit(pcm))))), 6)
        cent = round(multimodal.framed_centroid_reference(pcm), 3)
        g = got.loc[r["rid"]]
        assert g["n_samples"] == len(pcm)
        assert abs(g["rms"] - rms) < 1e-9
        assert abs(g["zcr"] - zcr) < 1e-9
        assert abs(g["spectral_centroid_hz"] - cent) < 1e-6


def test_audio_quality_matches_per_row_reference(spark, clips):
    """The batched quality kernel (peak / dBFS / silence / clipping) must
    match the per-row reference exactly (same rounding), including the
    -120 dBFS floor on a digitally silent payload."""
    from drift_detection_pibic___framework_spark.functions import audio
    sub = clips.filter("part = 2").limit(80)
    got = multimodal.audio_quality(sub).toPandas().set_index("rid")
    pdf = sub.select("rid", "bytes", "codec").toPandas()
    assert len(got) == len(pdf)
    for _, r in pdf.iterrows():
        pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
        peak, dbfs, sil, clp = multimodal.audio_quality_reference(pcm)
        g = got.loc[r["rid"]]
        assert abs(g["peak"] - round(peak, 6)) < 1e-9
        assert abs(g["rms_dbfs"] - round(dbfs, 4)) < 1e-9
        assert abs(g["silence_ratio"] - round(sil, 6)) < 1e-9
        assert abs(g["clip_ratio"] - round(clp, 6)) < 1e-9


def test_audio_quality_silent_clip_floor(spark):
    """All-zero PCM payload -> peak 0, dBFS at the floor, silence 1."""
    df = spark.createDataFrame(
        [Row(rid=1, clip_id="s", part=0,
             bytes=bytearray(b"\x00" * 640), codec="pcm_s16le")])
    g = multimodal.audio_quality(df).collect()[0]
    assert g["peak"] == 0.0
    assert g["rms_dbfs"] == multimodal.DBFS_FLOOR
    assert g["silence_ratio"] == 1.0 and g["clip_ratio"] == 0.0


# -------------------------------------------------------------------------
# connected components (duplicate-group resolution)
# -------------------------------------------------------------------------

def test_connected_components_chain_and_clique(spark):
    """A 4-node chain (diameter 3 — forces multiple propagation rounds),
    a 3-clique, and an isolated pair resolve to min-id components."""
    from drift_detection_pibic___framework_spark.operators import dedup
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # clique
         (20, 21)],                     # pair
        ["doc_a", "doc_b"])
    got = {(r.node, r.component)
           for r in dedup.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (12, 10),
                   (20, 20), (21, 20)}


def test_connected_components_direction_independent(spark):
    """Edge direction must not matter (pairs come in doc_a<doc_b order but
    min labels flow both ways)."""
    from drift_detection_pibic___framework_spark.operators import dedup
    pairs = spark.createDataFrame([(5, 1), (2, 5)], ["doc_a", "doc_b"])
    got = {(r.node, r.component)
           for r in dedup.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (5, 1)}


def test_connected_components_nonconvergence_raises(spark):
    """A chain whose min-label eccentricity exceeds max_iter must fail
    LOUD (partial labels would let keep_canonical keep non-canonical
    duplicates silently); the same chain converges with enough rounds."""
    import pytest as _pt
    from drift_detection_pibic___framework_spark.operators import dedup
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["doc_a", "doc_b"])
    with _pt.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=3)
    got = {(r.node, r.component)
           for r in dedup.connected_components(chain, max_iter=10).collect()}
    assert got == {(i, 0) for i in range(9)}


# -------------------------------------------------------------------------
# deterministic sampling
# -------------------------------------------------------------------------

def test_hash_sample_deterministic_and_partition_invariant(spark):
    from drift_detection_pibic___framework_spark.operators import sampling
    df = spark.range(0, 4000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in sampling.hash_sample(df, "k", 32).collect())
    b = sorted(r.k for r in
               sampling.hash_sample(df.repartition(13), "k", 32).collect())
    assert a == b and len(a) > 0
    # ~32/256 = 12.5% within loose bounds
    assert 0.08 < len(a) / 4000 < 0.18


def test_hash_sample_threshold_monotone(spark):
    from drift_detection_pibic___framework_spark.operators import sampling
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    small = {r.k for r in sampling.hash_sample(df, "k", 16).collect()}
    big = {r.k for r in sampling.hash_sample(df, "k", 64).collect()}
    assert small < big


def test_group_cap(spark):
    from drift_detection_pibic___framework_spark.operators import sampling
    rows = [(g, i) for g in ("a", "b") for i in range(10)] + [("c", 0)]
    df = spark.createDataFrame(rows, ["g", "i"])
    got = sampling.group_cap(df, "g", 3, "i").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append(r.i)
    assert {k: sorted(v) for k, v in by_g.items()} == {
        "a": [0, 1, 2], "b": [0, 1, 2], "c": [0]}
    assert set(df.columns) == set(got[0].asDict().keys())


def test_dedup_corpus_end_to_end(spark):
    """Exact copies collapse to the min-id doc; near-dups (one word
    changed) collapse via the pair phase; distinct docs survive."""
    from pyspark.sql import functions as F
    from drift_detection_pibic___framework_spark.operators import dedup
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight ok"),
        (2, "the quick brown fox jumps over the lazy dog tonight ok"),
        (3, "THE quick   brown fox jumps over the lazy dog tonight ok"),
        (4, "the quick brown fox jumps over the lazy cat tonight ok"),
        (5, "a completely different document about spark partitioning"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def exact_pairs(survivors):
        ids = survivors.select("doc_id")
        cand = (ids.alias("a").crossJoin(ids.alias("b"))
                .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                .select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b")))
        return (dedup.jaccard_pairs(survivors, cand)
                .filter(F.col("jaccard") >= 0.5))

    got = sorted(r.doc_id for r in
                 dedup.dedup_corpus(docs, pairs=exact_pairs).collect())
    # 2 and 3 are exact dups of 1 (after normalization); 4 is a near-dup
    # of 1 (9/11 shared 3-shingles fails only at the changed word);
    # component {1,4} keeps 1.
    assert got == [1, 5]


def test_keep_canonical_preserves_columns(spark):
    from drift_detection_pibic___framework_spark.operators import dedup
    docs = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b"), (3, "z", "c")],
        ["doc_id", "text", "meta"])
    pairs = spark.createDataFrame([(1, 3)], ["doc_a", "doc_b"])
    out = dedup.keep_canonical(docs, pairs)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]
    assert out.columns == docs.columns


def test_hash_sample_boundary_thresholds(spark):
    """threshold 256 keeps EVERY row (the 2-char-prefix lexicographic
    compare against '100' kept ~6.6% before the short-circuit);
    threshold 0 keeps none."""
    from drift_detection_pibic___framework_spark.operators import sampling
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    assert sampling.hash_sample(df, "k", 256).count() == 500
    assert sampling.hash_sample(df, "k", 0).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        sampling.hash_sample(df, "k", 257)


def test_ivf_fit_sample_spans_partitions(spark):
    """The centroid training sample must be drawn uniformly across ALL
    partitions, not the first file's rows (first-rows bias)."""
    import numpy as np
    rows = [(i, [float(i)] * 4) for i in range(1000)]
    emb4 = (spark.createDataFrame(rows, ["vec_id", "embedding"])
            .repartitionByRange(4, "vec_id"))
    pdf = similarity._fit_sample(emb4, 100, "embedding", "vec_id")
    ids = np.sort(pdf["vec_id"].to_numpy())
    assert len(ids) == 100
    # every quarter of the id range (== one range partition) is represented
    for lo in (0, 250, 500, 750):
        assert ((ids >= lo) & (ids < lo + 250)).any(), lo
    # deterministic across partitionings
    pdf2 = similarity._fit_sample(
        spark.createDataFrame(rows, ["vec_id", "embedding"]).coalesce(1),
        100, "embedding", "vec_id")
    assert sorted(pdf2["vec_id"]) == sorted(pdf["vec_id"])


def test_with_split_deterministic_proportions(spark):
    """80/10/10 split: proportions land near the weights, the assignment
    is identical under re-partitioning, every row gets exactly one split,
    and a single-split map is the identity."""
    from drift_detection_pibic___framework_spark.operators import sampling
    df = spark.range(0, 8000).withColumnRenamed("id", "k")
    sp = sampling.with_split(df, "k", {"train": 0.8, "val": 0.1,
                                       "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              sp.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 8000
    assert 0.75 < counts["train"] / 8000 < 0.85
    assert 0.07 < counts["val"] / 8000 < 0.13
    a = sorted((r.k, r.split) for r in sp.collect())
    b = sorted((r.k, r.split) for r in
               sampling.with_split(df.repartition(13), "k",
                                   {"train": 0.8, "val": 0.1,
                                    "test": 0.1}).collect())
    assert a == b
    only = sampling.with_split(df, "k", {"all": 1.0})
    assert only.filter("split = 'all'").count() == 8000
    import pytest as _pt
    with _pt.raises(ValueError):
        sampling.with_split(df, "k", {})


def test_dedup_incremental_against_corpus(spark):
    """Daily-increment admission: exact corpus copies, near corpus dups,
    and within-increment dups are all dropped; genuinely new docs are
    admitted with the min-id canonical kept for increment-internal
    groups."""
    base = "the quick brown fox jumps over the lazy dog again today fine"
    corpus = spark.createDataFrame(
        [(1, base),
         (2, "completely different corpus text about mountains and rivers "
             "flowing gently downhill")],
        ["doc_id", "text"])
    increment = spark.createDataFrame(
        [(100, base),                                    # exact corpus copy
         (101, base.replace("dog", "cat")),              # near corpus dup
         (102, "fresh unseen document with plenty of novel words in it "
               "for testing purposes"),
         (103, "fresh unseen document with plenty of novel words in it "
               "for testing purposes"),                  # increment dup
         (104, "another entirely new and unrelated piece of text full of "
               "original content")],
        ["doc_id", "text"])
    got = sorted(r.doc_id for r in
                 dedup.dedup_incremental(increment, corpus,
                                         threshold=0.5).collect())
    assert got == [102, 104]


_INC_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again today fine"),
    (2, "completely different corpus text about mountains and rivers "
        "flowing gently downhill"),
    (3, "a third corpus document describing oceans tides and the moon "
        "pulling water around the globe"),
]
_INC_NEW = [
    (100, _INC_CORPUS[0][1]),                            # exact corpus copy
    (101, _INC_CORPUS[0][1].replace("dog", "cat")),      # near corpus dup
    (102, "fresh unseen document with plenty of novel words in it "
          "for testing purposes"),
    (103, "fresh unseen document with plenty of novel words in it "
          "for testing purposes"),                       # increment dup
    (104, "another entirely new and unrelated piece of text full of "
          "original content"),
]


def _plan_text(df):
    import io as _io
    from contextlib import redirect_stdout
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dedup_index_parity_and_single_corpus_scan(spark, tmp_path):
    """The persisted-index path admits exactly what the inline path
    admits, AND its plan reads the corpus table exactly ONCE — the
    verify join's candidate text lookup (the O(increment) contract,
    VERDICT r3 top ask).  The inline path re-derives digests + MinHash
    bands from corpus text, scanning it three times."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)

    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(_INC_CORPUS, ["doc_id", "text"]) \
        .write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    increment = spark.createDataFrame(_INC_NEW, ["doc_id", "text"])

    idx = dedup.DedupIndex(ParquetTableIO(str(tmp_path / "idx")))
    idx.build(corpus)

    admitted = idx.admit(increment, corpus, threshold=0.5)
    assert sorted(r.doc_id for r in admitted.collect()) == [102, 104]

    # plan contract: ONE corpus scan in the indexed plan (the verify
    # join's candidate text lookup); the inline path re-derives digest +
    # band keys from corpus text, so its lazy plan scans it repeatedly
    n_indexed = _plan_text(admitted).count(corpus_path)
    n_inline = _plan_text(
        dedup.dedup_incremental(increment, corpus, threshold=0.5)
    ).count(corpus_path)
    assert n_indexed == 1, f"indexed plan scans corpus {n_indexed}x"
    assert n_inline > 1, f"inline plan scans corpus {n_inline}x"


def test_dedup_index_commit_then_next_increment(spark, tmp_path):
    """After committing increment 1's admitted keys, increment 2 is
    deduped against corpus AND increment 1 without any rebuild: an exact
    copy and a near-dup of an admitted inc-1 doc are rejected, fresh text
    is admitted."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)

    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(_INC_CORPUS, ["doc_id", "text"]) \
        .write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    inc1 = spark.createDataFrame(_INC_NEW, ["doc_id", "text"])

    idx = dedup.DedupIndex(ParquetTableIO(str(tmp_path / "idx")))
    idx.build(corpus)
    adm1_path = str(tmp_path / "adm1")
    idx.admit(inc1, corpus, threshold=0.5).write.parquet(adm1_path)
    adm1 = spark.read.parquet(adm1_path)
    idx.commit(adm1)

    inc2 = spark.createDataFrame(
        [(200, _INC_NEW[2][1]),                        # exact copy of 102
         (201, _INC_NEW[4][1].replace("original", "changed")),  # near 104
         (202, "a genuinely novel increment two document about glaciers "
               "carving valleys over millennia")],
        ["doc_id", "text"])
    # text lookup for inc-2 candidates must cover corpus + admitted docs
    lookup = corpus.unionByName(adm1)
    adm2 = idx.admit(inc2, lookup, threshold=0.5)
    assert sorted(r.doc_id for r in adm2.collect()) == [202]


def test_dedup_index_rollback_reopens_rolled_back_ids(spark, tmp_path):
    """A poisoned increment is committed, then rolled back via its commit
    token: its keys vanish from the index, so re-admitting the same text
    succeeds again — and the clean corpus baseline still dedups."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)

    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(_INC_CORPUS, ["doc_id", "text"]) \
        .write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    idx = dedup.DedupIndex(ParquetTableIO(str(tmp_path / "idx")))
    base_token = idx.build(corpus)

    poisoned = spark.createDataFrame(
        [(300, "a poisoned spammy document that slipped through review "
               "and must be unwound from the admission index")],
        ["doc_id", "text"])
    adm_path = str(tmp_path / "adm")
    idx.admit(poisoned, corpus, threshold=0.5).write.parquet(adm_path)
    adm = spark.read.parquet(adm_path)
    assert adm.count() == 1
    idx.commit(adm)

    # while committed, a copy of the poisoned doc is rejected
    copy = spark.createDataFrame([(301, poisoned.collect()[0].text)],
                                 ["doc_id", "text"])
    assert idx.admit(copy, corpus.unionByName(adm),
                     threshold=0.5).count() == 0

    idx.rollback(base_token)
    # after rollback the same text re-admits; corpus dedup still holds
    assert idx.admit(copy, corpus, threshold=0.5).count() == 1
    exact_copy = spark.createDataFrame([(302, _INC_CORPUS[0][1])],
                                       ["doc_id", "text"])
    assert idx.admit(exact_copy, corpus, threshold=0.5).count() == 0


def test_decontaminate_drops_poisoned_doc(spark):
    """A corpus doc embedding a benchmark passage verbatim (mid-text) is
    dropped; clean docs survive; the report pins exactly which eval doc
    leaked and the shared-shingle count."""
    bench_text = ("what is the capital of france the capital of france "
                  "is paris which has been the seat of government")
    eval_docs = spark.createDataFrame([(0, bench_text)],
                                      ["eval_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "a scraped page saying " + bench_text + " and other things"),
         (2, "an unrelated clean document about cooking pasta with fresh "
             "tomatoes basil and olive oil on a sunday afternoon is nice"),
         (3, "too short to shingle")],
        ["doc_id", "text"])
    survivors = sorted(r.doc_id for r in
                       dedup.decontaminate(corpus, eval_docs, n=13)
                       .collect())
    assert survivors == [2, 3]
    rep = dedup.contamination_report(corpus, eval_docs, n=13).collect()
    assert len(rep) == 1
    r = rep[0]
    # 19-token passage fully contained -> 19-13+1 = 7 contiguous windows
    assert (r.doc_id, r.eval_id, r.n_shared) == (1, 0, 7)


def test_pii_scrub_masks_and_counts(spark):
    """Every PII class is counted on the original text and byte-replaced
    in the masked copy; clean text is untouched with zero counts."""
    from drift_detection_pibic___framework_spark.operators.text import (
        pii_scrub)
    df = spark.createDataFrame(
        [(1, "mail a@b.org and c.d@e.co.uk, call 555-123-4567, "
             "ssn 078-05-1120, server 192.168.0.1 ok"),
         (2, "a perfectly clean sentence with the number 1234 in it")],
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    r1 = rows[1]
    assert (r1.n_email, r1.n_phone, r1.n_ssn, r1.n_ipv4) == (2, 1, 1, 1)
    assert r1.n_pii == 5
    assert r1.masked_text == ("mail <EMAIL> and <EMAIL>, call <PHONE>, "
                              "ssn <SSN>, server <IPV4> ok")
    r2 = rows[2]
    assert r2.n_pii == 0
    assert r2.masked_text == r2.text


# -- mixture sampling & sequence packing ----------------------------------

def test_mixture_sample_rates_and_stability(spark, docs):
    from drift_detection_pibic___framework_spark.operators import sampling
    rates = {"src0": 1.0, "src1": 0.0}
    kept = sampling.mixture_sample(docs, "source", rates, "doc_id",
                                   default_rate=0.25)
    per = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["src0"] == totals["src0"]          # rate 1.0 keeps all
    assert "src1" not in per                      # rate 0.0 drops all
    others = sum(v for s, v in per.items() if s not in rates)
    tot_others = sum(v for s, v in totals.items() if s not in rates)
    assert 0 < others < tot_others                # default rate is partial
    # deterministic under re-sharding
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in
                  sampling.mixture_sample(docs.repartition(13), "source",
                                          rates, "doc_id", 0.25)
                  .select("doc_id").collect())
    assert ids == ids2


def test_embedding_health_screen(spark, emb):
    """NaN, zero-vector and norm-blow-up rows are flagged with the right
    reasons; the clean fixture flags nothing at z=6."""
    assert similarity.embedding_health(emb).count() == 0
    bad = spark.createDataFrame(
        [Row(vec_id=9000001, embedding=[float("nan")] * 4),
         Row(vec_id=9000002, embedding=[0.0] * 4),
         Row(vec_id=9000003, embedding=[500.0] * 4)]
        + [Row(vec_id=i, embedding=[1.0, float(i % 3), 0.5, -1.0])
           for i in range(60)])
    got = {r["vec_id"]: r["reason"] for r in
           similarity.embedding_health(bad).collect()}
    assert got[9000001] == "nan_or_null_component"
    assert got[9000002] == "zero_vector"
    assert got[9000003] == "norm_outlier"
    assert all(v >= 9000000 for v in got)   # clean rows untouched


def test_tfidf_ranks_distinctive_terms(spark):
    """A term unique to one doc must outrank a corpus-wide term in that
    doc; output is exactly top-k per doc with deterministic ties."""
    d = spark.createDataFrame([
        Row(doc_id=1, text="common common rare common"),
        Row(doc_id=2, text="common common common"),
        Row(doc_id=3, text="common other other"),
    ])
    out = {}
    for r in text.tfidf_top_terms(d, k=2).collect():
        out.setdefault(r["doc_id"], []).append((r["term"], r["tfidf"]))
    # exact smooth-idf weights (N=3): rare tf=1 df=1, common tf=3 df=3
    import math
    assert dict(out[1])["rare"] == round(math.log(4 / 2) + 1, 6)
    assert dict(out[1])["common"] == round(3 * (math.log(4 / 4) + 1), 6)
    # doc 3: 'other' (tf=2, df=1) must outrank 'common' (tf=1, df=3)
    ranked3 = sorted(out[3], key=lambda t: -t[1])
    assert ranked3[0][0] == "other"
    assert all(len(v) <= 2 for v in out.values())


def test_chunk_text_boundaries(spark):
    """Overlap chunker: starts step by stride, the tail chunk is partial,
    a sub-window doc is exactly one chunk, coverage is gap-free."""
    from drift_detection_pibic___framework_spark.operators.packing import (
        chunk_text)
    d = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(f"t{i}" for i in range(10))),
        Row(doc_id=2, text=" ".join(f"t{i}" for i in range(11))),
        Row(doc_id=3, text="a b c"),
    ])
    out = {}
    for r in chunk_text(d, window=4, stride=2).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_tok"], r["chunk_text"]))
    # n=10, w=4, s=2: starts 0,2,4,6 — last chunk ends exactly at token 9
    assert [(c, s, n) for c, s, n, _ in sorted(out[1])] == [
        (0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4)]
    assert sorted(out[1])[0][3] == "t0 t1 t2 t3"
    # n=11: one more (partial) chunk at start 8 with 3 tokens
    assert sorted(out[2])[-1] == (4, 8, 3, "t8 t9 t10")
    # sub-window doc: single chunk, full text
    assert out[3] == [(0, 0, 3, "a b c")]
    # gap-free coverage: every token index is inside some chunk
    for rows in out.values():
        covered = set()
        for _, s, n, _ in rows:
            covered.update(range(s, s + n))
        assert covered == set(range(max(covered) + 1))


def test_chunk_text_rejects_bad_params(spark, docs):
    from drift_detection_pibic___framework_spark.operators.packing import (
        chunk_text)
    with pytest.raises(ValueError):
        chunk_text(docs, window=0)
    with pytest.raises(ValueError):
        chunk_text(docs, stride=-1)


def test_pack_sequences_invariants_and_shard_invariance(spark, docs):
    """The two-phase distributed prefix sum must equal the single-node
    reference packing for ANY shard count, and every offset must sit
    inside the budget."""
    import hashlib
    from drift_detection_pibic___framework_spark.operators.packing import (
        pack_sequences)
    budget = 500
    d = docs.select("doc_id", F.size(F.split(F.lower(F.trim(
        F.regexp_replace("text", r"\s+", " "))), " "))
        .cast("long").alias("n_tokens"))
    out1 = {r["doc_id"]: r for r in
            pack_sequences(d, budget, num_shards=1).collect()}
    out7 = {r["doc_id"]: r for r in
            pack_sequences(d, budget, num_shards=7).collect()}
    # single-node reference: sort by md5('pack:'||id), running offset
    rows = sorted(
        ((hashlib.md5(f"pack:{k}".encode()).hexdigest(), k,
          out1[k]["n_tokens"]) for k in out1))
    start = 0
    for _, k, ntok in rows:
        for out in (out1, out7):
            r = out[k]
            assert r["seq_id"] == start // budget
            assert r["offset_in_seq"] == start % budget
            assert 0 <= r["offset_in_seq"] < budget
            assert (r["n_seqs_spanned"]
                    == (start + ntok - 1) // budget - start // budget + 1)
        start += ntok


def test_audio_trim_matches_per_row_reference(spark, clips):
    """The batched trim kernel (flatnonzero + searchsorted across the
    chunk) must match the per-row reference exactly."""
    from drift_detection_pibic___framework_spark.functions import audio
    sub = clips.filter("part = 1").limit(80)
    got = multimodal.audio_trim_offsets(sub).toPandas().set_index("rid")
    pdf = sub.select("rid", "sr_hz", "bytes", "codec").toPandas()
    assert len(got) == len(pdf)
    for _, r in pdf.iterrows():
        pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
        s, e, lead, trail = multimodal.audio_trim_reference(
            pcm, int(r["sr_hz"]))
        g = got.loc[r["rid"]]
        assert (g["trim_start"], g["trim_end"]) == (s, e)
        assert abs(g["lead_ms"] - lead) < 1e-9
        assert abs(g["trail_ms"] - trail) < 1e-9


def test_audio_trim_silent_and_padded_clips(spark):
    """All-silent -> (0, 0), full duration as lead; a voiced middle with
    silent edges trims to the voiced span."""
    sr = 16000
    silent = bytearray(b"\x00" * 320)                  # 160 samples
    padded = np.zeros(160, dtype=np.int16)
    padded[40:120] = 16000                             # voiced 40..119
    df = spark.createDataFrame([
        Row(rid=1, clip_id="s", part=0, sr_hz=sr,
            bytes=silent, codec="pcm_s16le"),
        Row(rid=2, clip_id="v", part=0, sr_hz=sr,
            bytes=bytearray(padded.tobytes()), codec="pcm_s16le")])
    g = {r.rid: r for r in multimodal.audio_trim_offsets(df).collect()}
    assert (g[1].trim_start, g[1].trim_end) == (0, 0)
    assert g[1].lead_ms == 10.0 and g[1].trail_ms == 0.0
    assert (g[2].trim_start, g[2].trim_end) == (40, 120)
    assert g[2].lead_ms == 2.5 and g[2].trail_ms == 2.5


def test_audio_segments_match_per_row_reference(spark, clips):
    """The chunk-vectorized segmentation kernel (cumsum energies +
    sentinel-separated run transitions) must match the per-row reference
    exactly on real fixture clips."""
    from drift_detection_pibic___framework_spark.functions import audio
    sub = clips.filter("part = 2").limit(80)
    got = multimodal.audio_segments(sub).toPandas().set_index("rid")
    pdf = sub.select("rid", "sr_hz", "bytes", "codec").toPandas()
    assert len(got) == len(pdf)
    assert (got["n_segments"] > 0).any()  # fixtures aren't all-silent
    for _, r in pdf.iterrows():
        pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
        nf, vfr, nseg, ratio, lms = multimodal.audio_segments_reference(
            pcm, int(r["sr_hz"]))
        g = got.loc[r["rid"]]
        assert (g["n_frames"], g["voiced_frames"], g["n_segments"]) \
            == (nf, vfr, nseg)
        assert abs(g["speech_ratio"] - round(ratio, 6)) < 1e-12
        assert abs(g["longest_ms"] - lms) < 1e-9


def test_audio_segments_synthetic_runs(spark):
    """Constructed clips: all-silent -> 0 segments; two voiced bursts
    separated by a silent gap -> 2 segments with the longer run reported;
    a sub-frame clip -> all zeros."""
    L = multimodal.SEG_FRAME_LEN
    sr = 16000
    two = np.zeros(20 * L, dtype=np.int16)
    two[2 * L:5 * L] = 16000       # 3 voiced frames
    two[10 * L:12 * L] = 16000     # 2 voiced frames
    df = spark.createDataFrame([
        Row(rid=1, clip_id="silent", part=0, sr_hz=sr,
            bytes=bytearray(b"\x00" * (4 * L * 2)), codec="pcm_s16le"),
        Row(rid=2, clip_id="two", part=0, sr_hz=sr,
            bytes=bytearray(two.tobytes()), codec="pcm_s16le"),
        Row(rid=3, clip_id="tiny", part=0, sr_hz=sr,
            bytes=bytearray(b"\x00" * 10), codec="pcm_s16le")])
    g = {r.rid: r for r in multimodal.audio_segments(df).collect()}
    assert (g[1].n_frames, g[1].n_segments, g[1].voiced_frames) == (4, 0, 0)
    assert (g[2].n_frames, g[2].n_segments, g[2].voiced_frames) == (20, 2, 5)
    assert g[2].longest_ms == round(3 * L / sr * 1000.0, 3)
    assert (g[3].n_frames, g[3].n_segments, g[3].longest_ms) == (0, 0, 0.0)


def test_audio_fingerprint_matches_reference(spark, clips):
    """The batched envelope-fingerprint kernel (cumsum energies + one
    (rows, 66) boundary gather) must match the per-row reference
    bit-for-bit."""
    from drift_detection_pibic___framework_spark.functions import audio
    sub = clips.filter("part = 3").limit(80)
    got = {r.rid: r.fp for r in multimodal.audio_fingerprint(sub).collect()}
    pdf = sub.select("rid", "bytes", "codec").toPandas()
    assert len(got) == len(pdf)
    for _, r in pdf.iterrows():
        pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
        assert got[r["rid"]] == multimodal.audio_fingerprint_reference(pcm)
    assert len(set(got.values())) > 1  # envelopes differ across clips


def test_audio_fingerprint_transcode_near_dup(spark):
    """The same recording re-encoded (s16le vs G.711 mulaw) must land
    within a few fingerprint bits and be found by audio_near_duplicates;
    an unrelated recording must not pair with either."""
    from drift_detection_pibic___framework_spark.functions import audio
    rng = np.random.default_rng(11)
    n = 6500  # 100 samples per fingerprint segment
    t = np.arange(n)
    env = np.repeat(rng.uniform(0.05, 0.8, 66), 100)[:n]
    sig = audio.float_to_int16(env * np.sin(2 * np.pi * 180.0 * t / 2000.0))
    other = audio.float_to_int16(
        np.repeat(rng.uniform(0.05, 0.8, 66), 100)[:n]
        * np.sin(2 * np.pi * 240.0 * t / 2000.0))
    df = spark.createDataFrame([
        Row(rid=1, clip_id="a_s16", part=0,
            bytes=bytearray(audio.encode(sig, "pcm_s16le")),
            codec="pcm_s16le"),
        Row(rid=2, clip_id="a_mulaw", part=0,
            bytes=bytearray(audio.encode(sig, "mulaw")), codec="mulaw"),
        Row(rid=3, clip_id="b_s16", part=0,
            bytes=bytearray(audio.encode(other, "pcm_s16le")),
            codec="pcm_s16le")])
    pairs = {(r.clip_a, r.clip_b): r.hamming
             for r in multimodal.audio_near_duplicates(
                 df, max_hamming=4).collect()}
    assert ("a_mulaw", "a_s16") in pairs
    assert pairs[("a_mulaw", "a_s16")] <= 4
    assert not any("b_s16" in p for p in pairs)


def test_band_energy_matches_reference(spark, clips):
    """The batched band-energy kernel (chunked rFFT + bincount
    accumulation) must match the per-row reference within float
    summation-order noise on every clip of a partition slice."""
    from drift_detection_pibic___framework_spark.functions import audio
    sub = clips.filter("part = 4").limit(60)
    got = {r.rid: r for r in multimodal.audio_band_energy(sub).collect()}
    pdf = sub.select("rid", "bytes", "codec").toPandas()
    assert len(got) == len(pdf)
    for _, r in pdf.iterrows():
        pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
        fr, fl, ro = multimodal.band_energy_reference(pcm)
        g = got[r["rid"]]
        gf = [g[f"band_frac_{j}"] for j in range(multimodal.N_BANDS)]
        assert np.allclose(gf, np.round(fr, 6), atol=2e-6)
        assert abs(g["spectral_flatness"] - round(fl, 6)) < 2e-6
        assert abs(g["rolloff_hz"] - round(ro, 3)) < 1e-2
        assert abs(sum(gf) - 1.0) < 1e-4          # fractions sum to 1


def test_band_energy_edge_cases(spark):
    """Sub-frame clips produce all-zero features; a pure tone
    concentrates in its band with near-zero flatness; white noise is
    spread with high flatness."""
    from drift_detection_pibic___framework_spark.functions import audio
    rng = np.random.default_rng(5)
    n = 4096
    tone = audio.float_to_int16(
        0.4 * np.sin(2 * np.pi * 600.0 * np.arange(n) / 2000.0))
    noise = audio.float_to_int16(
        np.clip(rng.normal(0, 0.2, n), -0.9, 0.9))
    short = audio.float_to_int16(np.zeros(16))   # < one 128-sample frame
    df = spark.createDataFrame([
        Row(rid=1, clip_id="tone", part=0,
            bytes=bytearray(audio.encode(tone, "pcm_s16le")),
            codec="pcm_s16le"),
        Row(rid=2, clip_id="noise", part=0,
            bytes=bytearray(audio.encode(noise, "pcm_s16le")),
            codec="pcm_s16le"),
        Row(rid=3, clip_id="short", part=0,
            bytes=bytearray(audio.encode(short, "pcm_s16le")),
            codec="pcm_s16le")])
    out = {r.clip_id: r for r in
           multimodal.audio_band_energy(df).collect()}
    # 600 Hz falls in band [500, 750)
    assert out["tone"]["band_frac_4"] > 0.95
    assert out["tone"]["spectral_flatness"] < 0.05
    # a tone's rolloff sits at the tone: ~0.95 of energy is in its bin
    assert 550 < out["tone"]["rolloff_hz"] < 700
    assert out["noise"]["spectral_flatness"] > 0.3
    assert max(out["noise"][f"band_frac_{j}"] for j in range(6)) < 0.6
    assert out["noise"]["rolloff_hz"] > 800   # white noise: flat to Nyquist
    assert out["short"]["spectral_flatness"] == 0.0
    assert out["short"]["rolloff_hz"] == 0.0
    assert all(out["short"][f"band_frac_{j}"] == 0.0 for j in range(6))


def test_band_drift_separates_resampled_parts(spark):
    """The clips_band_drift screen: resampled (bandwidth-shifted)
    partitions must read an order of magnitude above the clean parts'
    L1 noise floor."""
    from drift_detection_pibic___framework_spark import queries as QQ
    rows = {r["part"]: r["l1_drift"]
            for r in QQ.QUERIES["clips_band_drift"](
                spark, "/root/testdata/sf0.001").collect()}
    clean = [v for p, v in rows.items() if 4 <= p < 12]
    shifted = [v for p, v in rows.items() if p >= 12]
    # 200 clips/part at sf0.001: clean-part L1 noise runs ~0.05-0.15
    # (an order tighter at sf0.01); the resample shift reads ~0.4
    assert max(clean) < 0.25
    assert min(shifted) > 0.3
    assert min(shifted) > 1.5 * max(clean)


def test_upsample_screen_flags_resampled_parts(spark):
    """clips_upsample_screen: the 2000->4000 resampled partitions must be
    the ONLY upsample suspects, and their rolloff fraction must sit well
    below the clean parts'."""
    from drift_detection_pibic___framework_spark import queries as QQ
    rows = {r["part"]: r for r in QQ.QUERIES["clips_upsample_screen"](
        spark, "/root/testdata/sf0.001").collect()}
    assert all(rows[p]["upsample_suspect"] for p in rows if p >= 14)
    assert not any(rows[p]["upsample_suspect"] for p in rows if p < 14)
    clean = [rows[p]["rolloff_frac"] for p in rows if p < 14]
    fake = [rows[p]["rolloff_frac"] for p in rows if p >= 14]
    assert max(fake) < 0.85 * min(clean)


def test_transcript_conflicts_flags_label_noise(spark):
    """Near-identical audio (transcode pair) with DISAGREEING transcripts
    must be flagged; the same pair with agreeing (normalized) transcripts
    must not; a NULL transcript on one twin counts as a conflict."""
    from drift_detection_pibic___framework_spark.functions import audio
    rng = np.random.default_rng(13)
    n = 6500
    t = np.arange(n)

    def clip(seed):
        env = np.repeat(rng.uniform(0.05, 0.8, 66), 100)[:n]
        return audio.float_to_int16(
            env * np.sin(2 * np.pi * (150.0 + 30 * seed) * t / 2000.0))

    a, b, c = clip(1), clip(2), clip(3)
    rows = [
        # pair 1: same recording, conflicting labels -> flagged
        Row(rid=1, clip_id="p1_s16", part=0,
            bytes=bytearray(audio.encode(a, "pcm_s16le")),
            codec="pcm_s16le", transcript="hello world"),
        Row(rid=2, clip_id="p1_mulaw", part=0,
            bytes=bytearray(audio.encode(a, "mulaw")), codec="mulaw",
            transcript="goodbye world"),
        # pair 2: same recording, same label modulo case/space -> clean
        Row(rid=3, clip_id="p2_s16", part=0,
            bytes=bytearray(audio.encode(b, "pcm_s16le")),
            codec="pcm_s16le", transcript="Same Words"),
        Row(rid=4, clip_id="p2_alaw", part=0,
            bytes=bytearray(audio.encode(b, "alaw")), codec="alaw",
            transcript="  same words "),
        # pair 3: same recording, one missing label -> flagged
        Row(rid=5, clip_id="p3_s16", part=0,
            bytes=bytearray(audio.encode(c, "pcm_s16le")),
            codec="pcm_s16le", transcript="labelled"),
        Row(rid=6, clip_id="p3_mulaw", part=0,
            bytes=bytearray(audio.encode(c, "mulaw")), codec="mulaw",
            transcript=None),
    ]
    df = spark.createDataFrame(rows)
    got = {(r.clip_a, r.clip_b)
           for r in multimodal.transcript_conflicts(df).collect()}
    assert ("p1_mulaw", "p1_s16") in got
    assert ("p3_mulaw", "p3_s16") in got
    assert not any("p2" in a_ for a_, _ in got)


def test_hamming_near_duplicates_generic(spark):
    """The factored-out 64-bit Hamming join: finds pairs within radius
    (including ones differing in the SIGN bit, i.e. negative bigints),
    excludes pairs beyond it."""
    from drift_detection_pibic___framework_spark.operators.dedup import (
        hamming_near_duplicates)
    def s64(v):  # wrap Python's infinite two's complement back into int64
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    base = -(1 << 63) | (1 << 10) | 7      # negative 64-bit value
    rows = [Row(id="x", h=base),
            Row(id="y", h=s64(base ^ (1 << 63) ^ 2)),   # hamming 2 (sign!)
            Row(id="z", h=s64(base ^ ((1 << 40) - 1)))]  # hamming 40
    got = {(r.id_a, r.id_b): r.hamming
           for r in hamming_near_duplicates(
               spark.createDataFrame(rows), "id", "h", 3).collect()}
    assert got == {("x", "y"): 2}


# -------------------------------------------------------------------------
# audio resample / loudness normalize (rate + loudness unification)
# -------------------------------------------------------------------------

def test_audio_resample_matches_per_row_reference(spark, clips):
    """The chunk-vectorized linear resampler must be byte-exact against
    the per-row reference (identical index math + identical int16
    quantization), both down- and up-sampling."""
    from drift_detection_pibic___framework_spark.functions import audio
    from drift_detection_pibic___framework_spark.sources.generators import (
        STORE_RATE)
    sub = clips.filter("part = 3").limit(60)
    pdf = sub.select("rid", "bytes", "codec").toPandas()
    for target in (STORE_RATE // 2, STORE_RATE * 3 // 2):
        got = (multimodal.audio_resample(sub, target)
               .toPandas().set_index("rid"))
        assert len(got) == len(pdf)
        for _, r in pdf.iterrows():
            pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
            ref = audio.float_to_int16(
                multimodal.resample_reference(pcm, STORE_RATE, target))
            g = got.loc[r["rid"]]
            assert g["n_in"] == len(pcm)
            assert g["n_out"] == len(ref)
            out = np.frombuffer(bytes(g["bytes"]), dtype="<i2")
            assert np.array_equal(out, ref)


def test_audio_resample_sine_snr(spark):
    """Downsampling a 50 Hz sine from the 2 kHz store rate to 1 kHz must
    reproduce the analytic 1 kHz-rate sine at >= 30 dB SNR (the
    north-rule invariant bar for decoded-PCM fidelity)."""
    from drift_detection_pibic___framework_spark.functions import audio
    sr_in, sr_out, f = 2000, 1000, 50.0
    t_in = np.arange(4000) / sr_in
    pcm = 0.7 * np.sin(2 * np.pi * f * t_in)
    df = spark.createDataFrame(
        [Row(rid=1, clip_id="sine", part=0,
             bytes=bytearray(audio.pcm_s16le_encode(
                 audio.float_to_int16(pcm))),
             codec="pcm_s16le")])
    g = multimodal.audio_resample(df, sr_out).collect()[0]
    out = np.frombuffer(bytes(g["bytes"]), dtype="<i2") / 32767.0
    t_out = np.arange(g["n_out"]) / sr_out
    ref = 0.7 * np.sin(2 * np.pi * f * t_out)
    assert audio.snr_db(ref, out) >= 30.0


def test_audio_loudnorm_matches_reference_and_hits_target(spark, clips):
    """Per-row parity on gain/limited, and the re-encoded payload's RMS
    must sit at the target loudness (within int16 quantization) whenever
    the limiter did not engage."""
    from drift_detection_pibic___framework_spark.functions import audio
    target = -20.0
    sub = clips.filter("part = 4").limit(60)
    got = (multimodal.audio_loudness_normalize(sub, target)
           .toPandas().set_index("rid"))
    pdf = sub.select("rid", "bytes", "codec").toPandas()
    assert len(got) == len(pdf)
    checked_target = 0
    for _, r in pdf.iterrows():
        pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
        gain, limited = multimodal.loudnorm_reference(pcm, target)
        g = got.loc[r["rid"]]
        assert abs(g["gain_db"] - round(20.0 * np.log10(gain), 4)) < 1e-9
        assert bool(g["limited"]) == limited
        out = np.frombuffer(bytes(g["bytes"]), dtype="<i2") / 32767.0
        assert np.abs(out).max() <= 1.0
        if not limited and g["rms_dbfs_in"] > multimodal.DBFS_FLOOR:
            out_dbfs = 20.0 * np.log10(np.sqrt(np.mean(out ** 2)))
            assert abs(out_dbfs - target) < 0.1
            checked_target += 1
    assert checked_target > 0


def test_audio_loudnorm_silent_and_limited_edges(spark):
    """A silent clip passes through at unity gain; a near-full-scale
    quiet-RMS clip requesting a big boost hits the peak limiter and the
    output peak stays under full scale."""
    from drift_detection_pibic___framework_spark.functions import audio
    spiky = np.zeros(2000)
    spiky[::100] = 0.95           # huge peak, low RMS -> limiter engages
    rows = [
        Row(rid=1, clip_id="silent", part=0,
            bytes=bytearray(b"\x00" * 640), codec="pcm_s16le"),
        Row(rid=2, clip_id="spiky", part=0,
            bytes=bytearray(audio.pcm_s16le_encode(
                audio.float_to_int16(spiky))),
            codec="pcm_s16le"),
    ]
    got = (multimodal.audio_loudness_normalize(spark.createDataFrame(rows),
                                               target_dbfs=-10.0)
           .toPandas().set_index("rid"))
    s = got.loc[1]
    assert s["gain_db"] == 0.0 and not s["limited"]
    assert bytes(s["bytes"]) == b"\x00" * 640
    k = got.loc[2]
    assert k["limited"]
    out = np.frombuffer(bytes(k["bytes"]), dtype="<i2") / 32767.0
    assert np.abs(out).max() <= multimodal.PEAK_CEILING + 1e-4
    assert k["rms_dbfs_out"] < -10.0   # limiter kept it below target


def test_audio_standardize_matches_composed_references(spark, clips):
    """The fused trim->resample->gain kernel must be byte-exact against
    the composition of the three per-row stage references, including
    trim bookkeeping and the limiter flag."""
    from drift_detection_pibic___framework_spark.functions import audio
    from drift_detection_pibic___framework_spark.sources.generators import (
        STORE_RATE)
    target_rate, target_dbfs = STORE_RATE // 2, -20.0
    sub = clips.filter("part = 5").limit(80)
    got = (multimodal.audio_standardize(sub, target_rate, target_dbfs)
           .toPandas().set_index("rid"))
    pdf = sub.select("rid", "bytes", "codec").toPandas()
    assert len(got) == len(pdf)
    for _, r in pdf.iterrows():
        pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
        ref, lead, trail, gain, limited = multimodal.standardize_reference(
            pcm, STORE_RATE, target_rate, target_dbfs)
        g = got.loc[r["rid"]]
        assert g["n_in"] == len(pcm)
        assert g["n_out"] == len(ref)
        assert abs(g["lead_trim_ms"] - round(lead, 3)) < 1e-9
        assert abs(g["trail_trim_ms"] - round(trail, 3)) < 1e-9
        assert abs(g["gain_db"] - round(20.0 * np.log10(gain), 4)) < 1e-9
        assert bool(g["limited"]) == limited
        out = np.frombuffer(bytes(g["bytes"]), dtype="<i2")
        assert np.array_equal(out, audio.float_to_int16(ref))


def test_audio_standardize_silent_clip_full_span(spark):
    """An all-silent clip keeps its full (resampled) span at unity gain —
    nothing to trim toward, nothing to normalize."""
    df = spark.createDataFrame(
        [Row(rid=1, clip_id="s", part=0,
             bytes=bytearray(b"\x00" * 800), codec="pcm_s16le")])
    g = multimodal.audio_standardize(df, 1000).collect()[0]
    assert g["n_in"] == 400 and g["n_out"] == 200
    assert g["lead_trim_ms"] == 0.0 and g["trail_trim_ms"] == 0.0
    assert g["gain_db"] == 0.0 and not g["limited"]


# -- training-window chunking ---------------------------------------------

def test_chunk_plan_reference_spec():
    """Pinned window geometry: full windows every hop while they fit, one
    tail >= min_tail, uniform start = seg_idx*hop (tail included)."""
    r = multimodal.chunk_plan_reference
    # dur < min_tail: nothing
    assert r(99, 400, 200, 100) == []
    # min_tail <= dur < win: one tail chunk covering the whole clip
    assert r(250, 400, 200, 100) == [(0, 0, 250)]
    # exactly one full window, remainder 0 < min_tail
    assert r(400, 400, 200, 100) == [(0, 0, 400)]
    # 700ms: full at 0 and 200 (200+400=600<=700), tail [400,700) = 300
    assert r(700, 400, 200, 100) == [(0, 0, 400), (1, 200, 600),
                                     (2, 400, 700)]
    # remainder below min_tail is dropped: 1050 -> full 0,200,400,600;
    # tail would be [800,1050) = 250 >= 100 -> kept
    assert r(1050, 400, 200, 100) == [
        (0, 0, 400), (1, 200, 600), (2, 400, 800), (3, 600, 1000),
        (4, 800, 1050)]
    # tail shorter than min_tail dropped: dur=850 -> n_full=3
    # (0,200,400), tail [600,850)=250 kept; dur=650 -> full 0,200;
    # tail [400,650)=250 kept; dur=620 tail [400,620)=220 kept;
    # dur=450 tail [200,450)=250 kept; dur=410 tail [200,410)=210 kept
    assert r(499, 400, 200, 450) == [(0, 0, 400)]  # tail 299 < 450 dropped


def test_chunk_plan_matches_reference_on_fixtures(spark, clips):
    """The Catalyst explode plan must equal the per-row reference over
    real fixture durations (including violation-injected rows)."""
    sub = clips.filter("part = 1")
    got = multimodal.chunk_plan(sub, 400, 200, 100).toPandas()
    durs = {r["clip_id"]: r["dur_ms"]
            for r in sub.select("clip_id", "dur_ms").collect()}
    by_clip = {c: sorted(g[["seg_idx", "start_ms", "end_ms"]]
                         .itertuples(index=False, name=None))
               for c, g in got.groupby("clip_id")}
    n_rows = 0
    for cid, dur in durs.items():
        want = multimodal.chunk_plan_reference(int(dur), 400, 200, 100)
        assert by_clip.get(cid, []) == want, cid
        n_rows += len(want)
    assert len(got) == n_rows
    # every emitted window obeys the uniform-start formula and tail rule
    assert (got["start_ms"] == got["seg_idx"] * 200).all()
    assert (got["seg_ms"] == got["end_ms"] - got["start_ms"]).all()
    assert (got["seg_ms"] <= 400).all() and (got["seg_ms"] >= 100).all()


def test_chunk_plan_never_reads_bytes(spark, clips):
    """The plan is metadata-only: the parquet ReadSchema must not include
    the bytes column."""
    plan = multimodal.chunk_plan(clips)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "bytes" not in plan


def test_audio_chunks_match_per_row_reference(spark, clips):
    """The batched slice kernel (one decode per chunk, one flat gather)
    must match the per-row reference: geometry, sample counts, rms, and
    the re-encoded payload bytes."""
    from drift_detection_pibic___framework_spark.functions import audio
    sub = clips.filter("part = 4").limit(60)
    got = multimodal.audio_chunks(sub, win_ms=400, hop_ms=200,
                                  min_tail_ms=100).toPandas()
    pdf = sub.select("rid", "dur_ms", "bytes", "codec").toPandas()
    n_rows = 0
    for _, r in pdf.iterrows():
        pcm = audio.int16_to_float(audio.decode(r["bytes"], r["codec"]))
        want = multimodal.audio_chunk_reference(
            pcm, int(r["dur_ms"]), win_ms=400, hop_ms=200,
            min_tail_ms=100)
        n_rows += len(want)
        g = got[got["rid"] == r["rid"]].sort_values("seg_idx")
        assert len(g) == len(want)
        for (seg_idx, s_ms, e_ms, n_s, rms, payload), (_, row) in zip(
                want, g.iterrows()):
            assert (row["seg_idx"], row["start_ms"], row["end_ms"],
                    row["n_samples"]) == (seg_idx, s_ms, e_ms, n_s)
            assert abs(row["rms"] - rms) < 1e-6
            assert bytes(row["bytes"]) == payload
    assert len(got) == n_rows


def test_audio_chunks_synthetic_edges(spark):
    """Constructed edges: a clip whose decoded payload is SHORTER than
    dur_ms implies (corrupt row) clips windows to the decoded length; a
    sub-min-tail clip yields no rows; windows re-decode to the exact
    source span."""
    from drift_detection_pibic___framework_spark.functions import audio
    sr = multimodal.STORE_RATE                  # 2000 Hz -> 2 samples/ms
    full = np.arange(1400, dtype=np.int16)      # 700ms at store rate
    short = np.arange(100, dtype=np.int16)      # decodes to 50ms
    df = spark.createDataFrame([
        Row(rid=1, clip_id="full", part=0, dur_ms=700,
            bytes=bytearray(full.tobytes()), codec="pcm_s16le"),
        Row(rid=2, clip_id="corrupt", part=0, dur_ms=700,
            bytes=bytearray(short.tobytes()), codec="pcm_s16le"),
        Row(rid=3, clip_id="tiny", part=0, dur_ms=80,
            bytes=bytearray(short.tobytes()), codec="pcm_s16le")])
    got = multimodal.audio_chunks(df, win_ms=400, hop_ms=200,
                                  min_tail_ms=100).toPandas()
    g1 = got[got["rid"] == 1].sort_values("seg_idx")
    assert list(g1["n_samples"]) == [800, 800, 600]
    w0 = audio.decode(bytes(g1.iloc[0]["bytes"]), "pcm_s16le")
    assert np.array_equal(w0, full[:800])
    w2 = audio.decode(bytes(g1.iloc[2]["bytes"]), "pcm_s16le")
    assert np.array_equal(w2, full[800:1400])
    # corrupt row: plan geometry from dur_ms, spans clipped to decoded len
    g2 = got[got["rid"] == 2].sort_values("seg_idx")
    assert list(g2["start_ms"]) == [0, 200, 400]
    assert list(g2["n_samples"]) == [100, 0, 0]
    assert (got["rid"] != 3).all()              # 80ms < min_tail


def test_epoch_order_deterministic_and_permutes(spark, docs):
    """epoch_order: same epoch -> identical assignment across calls and
    partitionings; different epochs -> different permutations; (shard,
    pos) is a dense 1..n_s numbering per shard."""
    from drift_detection_pibic___framework_spark.operators import sampling
    sub = docs.select("doc_id").limit(500)
    a = sampling.epoch_order(sub, "doc_id", epoch=1).collect()
    b = sampling.epoch_order(sub.repartition(7), "doc_id", epoch=1) \
        .collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = sampling.epoch_order(sub, "doc_id", epoch=2).collect()
    oa = {r["doc_id"]: (r["shard"], r["pos"]) for r in a}
    oc = {r["doc_id"]: (r["shard"], r["pos"]) for r in c}
    assert oa != oc                              # epochs permute
    assert set(oa) == set(oc)                    # same rows
    import collections
    per = collections.defaultdict(list)
    for s, p in oa.values():
        per[s].append(p)
    for s, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_semantic_decontaminate_drops_injected_near_dups(spark):
    """A corpus vector nearly identical to an eval vector is dropped;
    orthogonal vectors survive; the survivors frame keeps its columns."""
    import numpy as np
    from pyspark.sql import Row

    from drift_detection_pibic___framework_spark.operators import (
        similarity as S)

    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 16)).astype("float32")
    ev_rows = [Row(vec_id=100 + i, embedding=[float(x) for x in base[i]])
               for i in range(2)]
    corpus_rows = [
        # 0: near-copy of eval vector 0 (tiny noise) -> contaminated
        Row(vec_id=0, embedding=[float(x) for x in
                                 base[0] + 0.01 * rng.normal(size=16)]),
        # 1, 2: independent -> survive
        Row(vec_id=1, embedding=[float(x) for x in base[2]]),
        Row(vec_id=2, embedding=[float(x) for x in base[3]]),
    ]
    corpus = spark.createDataFrame(corpus_rows)
    ev = spark.createDataFrame(ev_rows)

    hits = S.semantic_contamination(corpus, ev, threshold=0.95).collect()
    assert {(r.vec_id, r.eval_id) for r in hits} == {(0, 100)}
    kept = S.semantic_decontaminate(corpus, ev, threshold=0.95)
    assert sorted(r.vec_id for r in kept.collect()) == [1, 2]
    assert kept.columns == corpus.columns


# ---------------------------------------------------------------------------
# edit-distance metrics (CER/WER): expression form vs Arrow kernel vs DP ref
# ---------------------------------------------------------------------------

def test_edit_metrics_golden(spark):
    """Hand-computed CER/WER cases for the expression form, including the
    NULL/empty conventions (NULL reads as '', a-side is the reference)."""
    from drift_detection_pibic___framework_spark.operators.text import \
        edit_metrics
    rows = [
        ("p1", "the quick brown fox", "the quick brown fox"),
        ("p2", "the quick brown fox", "the quick brown cat"),
        ("p3", "the quick brown fox", "quick brown fox"),
        ("p4", "hello world", "HELLO   world"),      # norm: identical
        ("p5", None, "two words"),                   # NULL vs text
        ("p6", None, None),                          # both missing
        ("p7", "abc", ""),                           # text vs empty
    ]
    df = spark.createDataFrame(rows, "pid string, t_a string, t_b string")
    out = {r["pid"]: r for r in edit_metrics(df, "t_a", "t_b").collect()}
    assert (out["p1"]["char_dist"], out["p1"]["tok_dist"],
            out["p1"]["wer"]) == (0, 0, 0.0)
    assert out["p2"]["tok_dist"] == 1 and out["p2"]["wer"] == 0.25
    assert out["p2"]["char_dist"] == 3          # fox -> cat
    assert out["p3"]["tok_dist"] == 1           # one deletion
    assert out["p3"]["char_dist"] == 4          # 'the ' removed
    assert out["p4"]["char_dist"] == 0 and out["p4"]["wer"] == 0.0
    assert out["p5"]["tok_dist"] == 2           # 2 insertions from []
    assert out["p5"]["wer"] == 2.0              # denominator max(0,1)=1
    assert out["p6"]["char_dist"] == 0 and out["p6"]["wer"] == 0.0
    assert out["p7"]["char_dist"] == 3 and out["p7"]["tok_dist"] == 1
    assert out["p7"]["cer"] == 1.0 and out["p7"]["wer"] == 1.0


def test_edit_metrics_kernel_parity(spark):
    """The Arrow kernel must agree with the expression form column-for-
    column on a randomized pair set (within the expression form's vocab
    cap), and must keep working ABOVE the cap where the expression form
    returns NULL tok_dist/wer."""
    from drift_detection_pibic___framework_spark.operators.text import \
        EDIT_MAX_VOCAB, edit_metrics, edit_metrics_kernel
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(80)]
    rows = []
    for i in range(60):
        a = " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        b = list(a.split(" ")) if a else []
        for _ in range(rng.integers(0, 5)):     # mutate b a few times
            op = rng.integers(0, 3)
            j = int(rng.integers(0, max(len(b), 1)))
            if op == 0 and b:
                b[j] = str(rng.choice(vocab))
            elif op == 1:
                b.insert(j, str(rng.choice(vocab)))
            elif op == 2 and b:
                del b[j]
        rows.append((f"r{i}", a or None, " ".join(b) or None))
    df = spark.createDataFrame(rows, "pid string, t_a string, t_b string")
    cols = ["char_dist", "cer", "tok_dist", "wer"]
    expr = {r["pid"]: tuple(r[c] for c in cols)
            for r in edit_metrics(df, "t_a", "t_b").collect()}
    kern = {r["pid"]: tuple(r[c] for c in cols)
            for r in edit_metrics_kernel(df, "t_a", "t_b").collect()}
    assert expr == kern

    # at the cap boundary (94 joint tokens = every ASCII slot used) the
    # expression form still matches the kernel; one more token NULLs it
    for n_joint, expect_null in ((94, False), (95, True)):
        ja = " ".join(f"t{i}" for i in range(n_joint - 10))
        jb = " ".join(f"t{i}" for i in range(n_joint - 20, n_joint - 10)) \
            + " " + " ".join(f"t{i}" for i in range(n_joint - 10, n_joint))
        jd = spark.createDataFrame([("j", ja, jb)],
                                   "pid string, t_a string, t_b string")
        je = edit_metrics(jd, "t_a", "t_b").collect()[0]
        jk = edit_metrics_kernel(jd, "t_a", "t_b").collect()[0]
        if expect_null:
            assert je["tok_dist"] is None
        else:
            assert je["tok_dist"] == jk["tok_dist"] is not None
            assert je["wer"] == jk["wer"]

    # above the vocab cap: expression form NULLs out, kernel still exact
    big_a = " ".join(f"a{i}" for i in range(150))
    big_b = " ".join(f"a{i}" for i in range(100, 260))
    big = spark.createDataFrame([("big", big_a, big_b)],
                                "pid string, t_a string, t_b string")
    assert 150 + 160 - 50 > EDIT_MAX_VOCAB      # joint vocab overflows
    e = edit_metrics(big, "t_a", "t_b").collect()[0]
    assert e["tok_dist"] is None and e["wer"] is None
    assert e["char_dist"] is not None           # char path has no cap
    k = edit_metrics_kernel(big, "t_a", "t_b").collect()[0]
    # keeping the 50-token common block would cost 100 deletions + 110
    # insertions = 210; 150 substitutions + 10 insertions is cheaper, so
    # the distance is max(len) = 160 (Levenshtein <= max length always)
    assert k["tok_dist"] == 160
    assert k["wer"] == round(160 / 150, 6)


def test_edit_distance_reference_dp():
    """The DP helper against python-bruteforce on tiny sequences."""
    from drift_detection_pibic___framework_spark.operators.text import \
        edit_distance_reference as ed
    assert ed([], []) == 0
    assert ed(list("kitten"), list("sitting")) == 3
    assert ed(list("flaw"), list("lawn")) == 2
    assert ed(["a", "b", "c"], ["a", "c"]) == 1
    assert ed([], ["x", "y"]) == 2


def test_edit_distance_banded_parity_and_giveup():
    """Ukkonen band vs the full DP: exact whenever the true distance is
    within the bound, explicit None whenever it is not — swept over
    random pairs at every k straddling the true distance."""
    import random

    from drift_detection_pibic___framework_spark.operators.text import (
        edit_distance_banded as edb, edit_distance_reference as ed)
    rng = random.Random(42)
    alpha = "abcd"
    for trial in range(120):
        a = [rng.choice(alpha) for _ in range(rng.randrange(0, 15))]
        b = list(a)
        for _ in range(rng.randrange(0, 6)):       # mutate b
            op = rng.randrange(3)
            if op == 0 and b:
                b.pop(rng.randrange(len(b)))
            elif op == 1:
                b.insert(rng.randrange(len(b) + 1), rng.choice(alpha))
            elif b:
                b[rng.randrange(len(b))] = rng.choice(alpha)
        true = ed(a, b)
        for k in (0, max(0, true - 1), true, true + 1, true + 5):
            got = edb(a, b, k)
            assert got == (true if true <= k else None), \
                (a, b, k, true, got)
    # length-gap fast path and empty sides
    assert edb(list("abc"), [], 2) is None
    assert edb(list("abc"), [], 3) == 3
    assert edb([], [], 0) == 0


def test_edit_distance_banded_long_transcript_bounded():
    """The scale guard: a pathological pair of 40k-char transcripts is
    O(k·n) under the band (full DP would be 1.6e9 cells).  Both the
    small-distance exact case and the give-up case must finish fast."""
    import time

    from drift_detection_pibic___framework_spark.operators.text import (
        edit_distance_banded as edb)
    base = ("the quick brown fox jumps over the lazy dog " * 900)
    near = "x" + base[2:20000] + "yy" + base[20002:]   # a few edits
    far = base[::-1]
    t0 = time.time()
    d = edb(list(base), list(near), 50)
    assert d is not None and 1 <= d <= 50
    assert edb(list(base), list(far), 50) is None      # early-exit row
    assert time.time() - t0 < 15


def test_edit_metrics_kernel_max_dist_giveup(spark):
    """max_dist plumbs the band through the kernel: distances within the
    bound match the unbounded kernel exactly; beyond it char/tok/cer/wer
    all come back NULL (the explicit give-up verdict)."""
    from drift_detection_pibic___framework_spark.operators.text import \
        edit_metrics_kernel
    df = spark.createDataFrame(
        [("close", "a b c d e", "a b x d e"),
         ("far", "a b c d e", "v w x y z"),
         ("null_a", None, "some words here")],
        "pid string, t_a string, t_b string")
    unb = {r["pid"]: r for r in
           edit_metrics_kernel(df, "t_a", "t_b").collect()}
    cap = {r["pid"]: r for r in
           edit_metrics_kernel(df, "t_a", "t_b", max_dist=3).collect()}
    for col in ("char_dist", "cer", "tok_dist", "wer"):
        assert cap["close"][col] == unb["close"][col] is not None
    assert cap["far"]["tok_dist"] is None and cap["far"]["wer"] is None
    assert unb["far"]["tok_dist"] == 5                 # unbounded stays exact
    # char distance of the far pair (9 chars apart > 3) also gives up
    assert cap["far"]["char_dist"] is None
    # NULL a-side vs 15-char b-side: insertion count 15 > 3 -> give-up
    assert cap["null_a"]["char_dist"] is None
    assert unb["null_a"]["char_dist"] == 15


# ---------------------------------------------------------------------------
# audio dropout screen: constant-sample runs
# ---------------------------------------------------------------------------

def test_audio_dropouts_match_per_row_reference(spark, clips):
    """The vectorized run-length kernel must agree with the per-row
    reference on real fixture payloads across all codecs (run equality
    is invariant under the injective int16 -> float64 decode, so the
    int16 reference pins the float kernel exactly)."""
    from drift_detection_pibic___framework_spark.functions import audio
    sub = clips.filter("part = 5").limit(80)     # has mulaw/alaw/pcm mix
    got = (multimodal.audio_dropouts(sub)
           .toPandas().set_index("rid"))
    pdf = sub.select("rid", "bytes", "codec").toPandas()
    assert len(got) == len(pdf)
    for _, r in pdf.iterrows():
        pcm = audio.decode(r["bytes"], r["codec"])
        mx, nd, ratio = multimodal.audio_dropouts_reference(pcm)
        g = got.loc[r["rid"]]
        assert g["n_samples"] == max(len(pcm), 1)
        assert g["max_const_run"] == mx
        assert g["n_dropout_runs"] == nd
        assert abs(g["dropout_ratio"] - round(ratio, 6)) < 1e-9
    # empty / undecodable payloads: the shared _decode_rows convention
    # (one zero sample) must hold in BOTH the kernel and the reference
    adversarial = spark.createDataFrame(
        [(900001, "e1", 0, b"", "pcm_s16le"),
         (900002, "e2", 0, b"", "mulaw"),
         (900003, "e3", 0, b"\x7f", "pcm_s16le")],  # odd-length s16
        "rid long, clip_id string, part int, bytes binary, codec string")
    adv = (multimodal.audio_dropouts(adversarial)
           .toPandas().set_index("rid"))
    assert multimodal.audio_dropouts_reference(np.array([])) == (1, 0, 0.0)
    for rid in (900001, 900003):                # zero/odd s16 -> 1 sample
        assert (adv.loc[rid]["n_samples"], adv.loc[rid]["max_const_run"],
                adv.loc[rid]["n_dropout_runs"],
                adv.loc[rid]["dropout_ratio"]) == (1, 1, 0, 0.0)
    assert adv.loc[900002]["n_samples"] == 1    # empty mulaw too


def test_audio_dropouts_synthetic_injection(spark):
    """A clip with an injected mid-clip sample-and-hold fault must be
    the ONLY dropout suspect; a clean noisy clip's longest run stays far
    below the 16-sample threshold; a boundary-straddling pair of rows
    must NOT merge runs across rows."""
    from drift_detection_pibic___framework_spark.functions import audio
    rng = np.random.default_rng(3)
    sig = audio.float_to_int16(rng.normal(0, 0.1, 2000))
    held = sig.copy()
    held[800:900] = held[800]                   # 100-sample hold fault
    # two rows ending/starting with the SAME value: runs must not merge
    edge_a = sig.copy(); edge_a[-10:] = 777
    edge_b = sig.copy(); edge_b[:10] = 777
    rows = [
        (1, "c1", 0, bytes(audio.encode(sig, "pcm_s16le")), "pcm_s16le"),
        (2, "c2", 0, bytes(audio.encode(held, "pcm_s16le")), "pcm_s16le"),
        (3, "c3", 0, bytes(audio.encode(edge_a, "pcm_s16le")), "pcm_s16le"),
        (4, "c4", 0, bytes(audio.encode(edge_b, "pcm_s16le")), "pcm_s16le"),
    ]
    df = spark.createDataFrame(
        rows, "rid long, clip_id string, part int, bytes binary, "
              "codec string")
    out = {r["rid"]: r for r in multimodal.audio_dropouts(df).collect()}
    assert out[2]["max_const_run"] == 100
    assert out[2]["n_dropout_runs"] == 1
    assert abs(out[2]["dropout_ratio"] - 0.05) < 1e-9
    assert out[1]["max_const_run"] < 16 and out[1]["n_dropout_runs"] == 0
    assert out[3]["max_const_run"] == 10 and out[3]["n_dropout_runs"] == 0
    assert out[4]["max_const_run"] == 10 and out[4]["n_dropout_runs"] == 0


# -- r5 review regressions: cache release, banding, dim validation ---------

def test_dedup_corpus_releases_internal_pairs(spark, docs, monkeypatch):
    """dedup_corpus must unpersist the pair frame IT created (r5 review:
    every AdmissionGate micro-batch leaked one pinned DataFrame through
    dedup_incremental -> dedup_corpus -> minhash_near_duplicates)."""
    captured = {}
    orig = dedup.minhash_near_duplicates

    def spy(*a, **kw):
        res = orig(*a, **kw)
        captured["pairs"] = res
        return res

    monkeypatch.setattr(dedup, "minhash_near_duplicates", spy)
    res = dedup.dedup_corpus(docs.limit(30), jaccard_threshold=0.2)
    res.count()
    assert not captured["pairs"].storageLevel.useMemory   # released
    # caller-supplied pair frames stay the caller's to manage
    mine = orig(docs.limit(30), threshold=0.2)
    dedup.dedup_corpus(docs.limit(30), pairs=mine).count()
    assert mine.storageLevel.useMemory
    mine.unpersist(blocking=True)


def test_banding_must_divide_signature(spark, docs):
    """bands > num_hashes makes every band slice empty (md5('') for all
    docs -> full cross product); non-dividing bands silently drops tail
    signature elements.  Both raise now (r5 review)."""
    with pytest.raises(ValueError, match="divisor"):
        dedup.minhash_near_duplicates(docs, num_hashes=4, bands=8)
    with pytest.raises(ValueError, match="divisor"):
        dedup.minhash_near_duplicates(docs, num_hashes=16, bands=5)
    with pytest.raises(ValueError, match="divisor"):
        dedup.DedupIndex(None, num_hashes=4, bands=8)
    with pytest.raises(ValueError, match="divisor"):
        dedup.build_dedup_index(docs, num_hashes=4, bands=8)
    with pytest.raises(ValueError, match="divisor"):
        dedup.dedup_incremental(docs.limit(1), docs, num_hashes=4, bands=8)


def test_embedding_dim_mismatch_raises(spark, emb):
    """A centroid/plane matrix narrower or wider than the embeddings must
    raise: zip_with pads with nulls, so a mismatch silently collapses
    every vector into one bucket/cell — an O(n^2) join with no error
    (r5 review)."""
    C32 = similarity.random_unit_centroids(32, 8, seed=1)
    with pytest.raises(ValueError, match="dim"):
        similarity.with_ivf_cell(emb, C32)
    with pytest.raises(ValueError, match="dim"):
        similarity.ivf_topk(emb, emb.limit(2), centroids=C32)
    with pytest.raises(ValueError, match="dim"):
        similarity.hyperplane_lsh_neighbors(emb, dim=32)
    with pytest.raises(ValueError, match="dim"):
        similarity.with_lsh_signature(emb, similarity.hyperplanes(32, 4))
    # matching dims still fine (and the empty frame is skipped, not probed)
    C64 = similarity.random_unit_centroids(64, 8, seed=1)
    similarity.with_ivf_cell(emb.limit(0), C32).count()
    assert similarity.with_ivf_cell(emb, C64).filter(
        "ivf_cell >= 0").count() == emb.count()
