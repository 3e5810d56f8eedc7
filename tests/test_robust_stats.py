"""Mergeable-moments rollup, exact histogram median / MAD screen, and
temperature-smoothed source mixing."""

import math
import random

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from drift_detection_pibic___framework_spark.operators import sampling, stats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


# -- mergeable moments ----------------------------------------------------

def test_moments_fold_matches_direct_stats(spark, clips):
    folded = stats.merge_moments(stats.moment_summaries(clips)).collect()[0]
    direct = clips.agg(
        F.count("sr_hz").alias("n"),
        F.round(F.avg("sr_hz"), 6).alias("mean"),
        F.round(F.stddev_samp("sr_hz"), 6).alias("std"),
        F.min("sr_hz").alias("mn"), F.max("sr_hz").alias("mx")).collect()[0]
    assert folded.sr_hz_n == direct.n
    assert folded.sr_hz_mean == pytest.approx(direct.mean, abs=1e-6)
    assert folded.sr_hz_stddev == pytest.approx(direct.std, abs=1e-6)
    assert (folded.sr_hz_min, folded.sr_hz_max) == (direct.mn, direct.mx)


def test_moments_fold_is_partitioning_invariant(spark, clips):
    a = stats.merge_moments(stats.moment_summaries(clips)).collect()[0]
    regrouped = clips.withColumn(
        "part", F.pmod(F.crc32(F.col("clip_id")), F.lit(7)).cast("int"))
    b = stats.merge_moments(stats.moment_summaries(regrouped)).collect()[0]
    assert a.asDict() == b.asDict()


# -- exact histogram median ----------------------------------------------

def test_exact_median_matches_percentile_cont(spark):
    rng = random.Random(7)
    rows = [Row(g=i % 3, v=rng.randint(0, 50)) for i in range(501)]
    # odd/even group sizes + ties + a null
    rows.append(Row(g=0, v=None))
    df = spark.createDataFrame(rows)
    got = {r.g: r.median
           for r in stats.exact_median(df, "g", "v").collect()}
    want = {r.g: r.m for r in df.groupBy("g").agg(
        F.expr("percentile(v, 0.5)").alias("m")).collect()}
    assert got.keys() == want.keys()
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=1e-12)


def test_exact_median_single_row_group(spark):
    df = spark.createDataFrame([Row(g=1, v=42)])
    assert stats.exact_median(df, "g", "v").collect()[0].median == 42.0


def test_mad_screen_flags_planted_outliers(spark):
    rows = [Row(g="a", v=100 + (i % 5)) for i in range(200)]
    rows += [Row(g="a", v=10_000)] * 3          # gross outliers
    rows += [Row(g="b", v=7)] * 50              # MAD == 0 group
    df = spark.createDataFrame(rows)
    out = {r.g: r for r in
           stats.mad_outlier_screen(df, "g", "v", k=6.0).collect()}
    assert out["a"].outliers == 3
    assert out["a"].median == pytest.approx(102.0)
    # constant group: MAD = 0, no row deviates, nothing flagged
    assert out["b"].outliers == 0
    assert out["b"].mad == 0.0


def test_exact_quantiles_match_percentile_cont(spark):
    rng = random.Random(11)
    rows = [Row(g=i % 2, v=rng.randint(0, 200)) for i in range(337)]
    df = spark.createDataFrame(rows)
    probs = [0.1, 0.25, 0.5, 0.75, 0.9]
    got = {r.g: r for r in
           stats.exact_quantiles(df, "g", "v", probs).collect()}
    want = {r.g: r.qs for r in df.groupBy("g").agg(
        F.expr(f"percentile(v, array({','.join(map(str, probs))}))")
        .alias("qs")).collect()}
    for g, qs in want.items():
        for p, exp in zip(probs, qs):
            assert got[g][f"q{int(p * 100)}"] == pytest.approx(exp, abs=1e-9)


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000),
                     min_size=1, max_size=400),
       p=st.floats(min_value=0.0, max_value=1.0,
                   allow_nan=False, allow_infinity=False))
def test_kll_dense_sketch_quantile_is_percentile_cont(vals, p):
    """A KLL that never compacted (n <= buffer) holds the data exactly, so
    its rank query must land within one order statistic of the ANSI
    percentile_cont interpolation (the sketch picks a retained item, the
    interpolation may sit between two)."""
    from drift_detection_pibic___framework_spark.functions.sketches import (
        kll_from_values)
    a = np.asarray(vals, dtype=np.float64)
    got = float(kll_from_values(a, k=500).quantile(p))
    s = np.sort(a)
    h = (len(s) - 1) * p
    lo, hi = s[int(math.floor(h))], s[int(math.ceil(h))]
    assert lo - 1e-9 <= got <= hi + 1e-9 or got in (lo, hi)


@settings(max_examples=30, deadline=None)
@given(a=st.lists(st.integers(min_value=0, max_value=60), min_size=2,
                  max_size=300),
       b=st.lists(st.integers(min_value=0, max_value=60), min_size=2,
                  max_size=300))
def test_kll_ks_distance_properties(a, b):
    """KS is a metric-like statistic: in [0,1], symmetric, 0 for identical
    sketches, and exact for dense (never-compacted) sketches."""
    from drift_detection_pibic___framework_spark.functions.sketches import (
        kll_from_values, kll_ks_distance)
    sa = kll_from_values(np.asarray(a, dtype=np.float64), k=500)
    sb = kll_from_values(np.asarray(b, dtype=np.float64), k=500)
    d = kll_ks_distance(sa, sb)
    assert 0.0 <= d <= 1.0
    assert d == pytest.approx(kll_ks_distance(sb, sa), abs=1e-12)
    assert kll_ks_distance(sa, sa) == 0.0
    # dense sketches are exact: compare against the numpy two-sample KS
    xs = np.union1d(a, b).astype(np.float64)
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    assert d == pytest.approx(float(np.max(np.abs(fa - fb))), abs=1e-12)


def test_length_buckets_quartiles_are_balanced(spark, docs):
    from drift_detection_pibic___framework_spark.operators import text
    b = text.length_buckets(docs).cache()
    sizes = {r.bucket: r.c for r in
             b.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    n = sum(sizes.values())
    assert set(sizes) == {0, 1, 2, 3}
    for c in sizes.values():   # quartile cuts: each bucket ~n/4 (ties skew)
        assert c == pytest.approx(n / 4, rel=0.25)
    # bucket id is monotone in n_tokens: max of bucket k <= min of bucket k+1
    rng = {r.bucket: (r.mn, r.mx) for r in b.groupBy("bucket").agg(
        F.min("n_tokens").alias("mn"), F.max("n_tokens").alias("mx"))
        .collect()}
    for k in (0, 1, 2):
        assert rng[k][1] <= rng[k + 1][0]
    b.unpersist()


# -- temperature mixing ---------------------------------------------------

def test_temperature_mix_biases_toward_small_sources(spark, docs):
    target = 300
    kept = sampling.temperature_mix(docs, "source", "doc_id", target)
    before = {r.source: r.c for r in
              docs.groupBy("source").agg(F.count("*").alias("c")).collect()}
    after = {r.source: r.c for r in
             kept.groupBy("source").agg(F.count("*").alias("c")).collect()}
    n_total = sum(before.values())
    wsum = sum(math.sqrt(n) for n in before.values())
    for s, n in before.items():
        expect = min(1.0, target * math.sqrt(n) / wsum / n) * n
        # md5 buckets are uniform: kept count within a loose binomial band
        assert after.get(s, 0) == pytest.approx(expect, abs=4 * math.sqrt(expect) + 2)
    # smoothing property: every source's keep-RATE >= the flat rate for
    # sources smaller than average, <= for larger (sqrt flattens the mix)
    flat = target / n_total
    for s, n in before.items():
        r_s = min(1.0, target * math.sqrt(n) / wsum / n)
        if n < n_total / len(before):
            assert r_s >= flat
    assert kept.count() == pytest.approx(target, rel=0.25)


def test_temperature_mix_deterministic_and_partition_invariant(spark, docs):
    a = sorted(r.doc_id for r in
               sampling.temperature_mix(docs, "source", "doc_id", 200).collect())
    b = sorted(r.doc_id for r in
               sampling.temperature_mix(docs.repartition(13), "source",
                                        "doc_id", 200).collect())
    assert a == b and len(a) > 0


def test_temperature_mix_rejects_bad_target(spark, docs):
    with pytest.raises(ValueError):
        sampling.temperature_mix(docs, "source", "doc_id", 0)


def test_group_entropy_model(spark):
    """Entropy/evenness against hand math: uniform group -> evenness 1;
    skewed group -> the exact -sum(p log2 p); single-value group ->
    entropy 0 with NULL evenness; nulls excluded from the histogram."""
    rows = ([Row(part=0, c="a")] * 2 + [Row(part=0, c="b")] * 2
            + [Row(part=1, c="a")] * 3 + [Row(part=1, c="b")] * 1
            + [Row(part=2, c="x")] * 4
            + [Row(part=3, c=None)] * 2 + [Row(part=3, c="y")] * 2)
    df = spark.createDataFrame(rows)
    out = {r.part: r for r in stats.group_entropy(df, "c").collect()}

    assert out[0].n_values == 2 and out[0].n_rows == 4
    assert out[0].entropy_bits == pytest.approx(1.0)
    assert out[0].evenness == pytest.approx(1.0)

    h = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert out[1].entropy_bits == pytest.approx(h, abs=1e-6)
    assert out[1].evenness == pytest.approx(h, abs=1e-6)  # log2(2)=1

    assert out[2].n_values == 1
    assert out[2].entropy_bits == pytest.approx(0.0)
    assert out[2].evenness is None

    # nulls excluded: part 3 is a single-value group of size 2
    assert out[3].n_values == 1 and out[3].n_rows == 2


def test_mutual_information_model(spark):
    """MI against hand math: independent columns -> 0; fully dependent
    (a == b) -> MI = H(a) and normalized 1; constant column -> 0/0-safe."""
    # independent: every (a, b) combo equally likely
    ind = spark.createDataFrame(
        [Row(a=x, b=y) for x in ("p", "q") for y in ("u", "v")] * 3)
    r = stats.mutual_information(ind, "a", "b").collect()[0]
    assert r.n_rows == 12
    assert r.mi_bits == pytest.approx(0.0, abs=1e-9)
    assert r.normalized_mi == pytest.approx(0.0, abs=1e-9)
    assert r.h_a == pytest.approx(1.0) and r.h_b == pytest.approx(1.0)

    # dependent: b determined by a, 2 equally-likely values
    dep = spark.createDataFrame(
        [Row(a="p", b="u")] * 5 + [Row(a="q", b="v")] * 5)
    r = stats.mutual_information(dep, "a", "b").collect()[0]
    assert r.mi_bits == pytest.approx(1.0)
    assert r.normalized_mi == pytest.approx(1.0)

    # constant a: H(a) = 0 -> normalized defined as 0, MI 0
    const = spark.createDataFrame(
        [Row(a="k", b="u")] * 3 + [Row(a="k", b="v")] * 3)
    r = stats.mutual_information(const, "a", "b").collect()[0]
    assert r.mi_bits == pytest.approx(0.0, abs=1e-9)
    assert r.normalized_mi == pytest.approx(0.0, abs=1e-9)

    # nulls on either side are excluded
    withnull = spark.createDataFrame(
        [Row(a="p", b="u"), Row(a=None, b="u"), Row(a="p", b=None)])
    r = stats.mutual_information(withnull, "a", "b").collect()[0]
    assert r.n_rows == 1


# ---------------------------------------------------------------------------
# functional-dependency violations + Benford first-digit screen
# ---------------------------------------------------------------------------

def test_fd_violations_model(spark):
    """lhs -> rhs violations: only multi-valued groups surface, NULL
    counts as its own value, and rhs_sample is sorted and capped."""
    rows = [
        ("k1", "a"), ("k1", "a"),                    # clean: one value
        ("k2", "b"), ("k2", "c"), ("k2", "a"),       # violation: 3 values
        ("k3", None), ("k3", None),                  # clean: one (null)
        ("k4", None), ("k4", "x"),                   # violation via null
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    out = {r["k"]: r for r in
           stats.fd_violations(df, "k", "v", max_sample=2).collect()}
    assert set(out) == {"k2", "k4"}
    assert out["k2"]["n_rows"] == 3
    assert out["k2"]["n_distinct_rhs"] == 3
    assert out["k2"]["rhs_sample"] == ["a", "b"]     # sorted, capped at 2
    assert out["k4"]["n_distinct_rhs"] == 2          # NULL + 'x'
    assert out["k4"]["rhs_sample"] == ["x"]          # nulls never sampled


def test_benford_check_model(spark):
    """A log-uniform magnitude sample conforms to Benford (not suspect);
    a uniform 100..999 sample has uniform first digits (suspect);
    non-positive rows are excluded from the digit histogram."""
    rng = np.random.default_rng(11)
    conforming = np.floor(10 ** rng.uniform(1, 5, 4000)).astype(int)
    uniform = rng.integers(100, 1000, 4000)
    rows = ([("conf", int(v)) for v in conforming]
            + [("unif", int(v)) for v in uniform]
            + [("unif", 0), ("unif", -7)])           # excluded rows
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in stats.benford_check(df, "v", "g").collect()}
    assert out["unif"]["n_rows"] == 4000             # 0 and -7 dropped
    assert not out["conf"]["benford_suspect"]
    assert out["conf"]["chi2"] < stats.BENFORD_CHI2_CRIT
    assert out["unif"]["benford_suspect"]
    assert out["unif"]["chi2"] > 100                 # wildly non-Benford

    # fractional magnitudes in (0, 1): the SIGNIFICANT digit is used, not
    # the string's first char ('0'), so a log-uniform fraction sample
    # conforms just like the integer one (code-review r4 finding)
    fracs = 10 ** rng.uniform(-4, 0, 4000)
    fdf = spark.createDataFrame([("f", float(v)) for v in fracs],
                                "g string, v double")
    fr = stats.benford_check(fdf, "v", "g").collect()[0]
    assert fr["n_rows"] == 4000
    assert not fr["benford_suspect"]

    # chi2 agrees with a numpy recomputation of the same formula
    d = np.array([int(str(v)[0]) for v in conforming])
    n = len(d)
    obs = np.array([(d == i).sum() for i in range(1, 10)], dtype=float)
    exp = n * np.log10(1 + 1 / np.arange(1, 10))
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert abs(out["conf"]["chi2"] - chi2) < 1e-4
