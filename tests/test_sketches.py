"""KLL sketch: accuracy, merge associativity/commutativity, serde (SURVEY §5
property tests)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from drift_detection_pibic___framework_spark.functions.sketches import KLL, kll_from_values

QS = np.array([0.05, 0.25, 0.5, 0.75, 0.95])


def _data(n=50000):
    return np.random.default_rng(1).lognormal(6.0, 0.4, n)


def test_accuracy_single_stream():
    v = _data()
    sk = kll_from_values(v)
    est, tru = sk.quantile(QS), np.quantile(v, QS)
    assert np.max(np.abs(est - tru) / tru) < 0.05


def test_merge_matches_full_build():
    v = _data()
    chunks = np.array_split(v, 7)
    merged = kll_from_values(chunks[0])
    for c in chunks[1:]:
        merged = merged.merge(kll_from_values(c))
    tru = np.quantile(v, QS)
    assert np.max(np.abs(merged.quantile(QS) - tru) / tru) < 0.10
    assert merged.n == len(v)


def test_merge_associative_commutative_estimates():
    v = _data(30000)
    a, b, c = (kll_from_values(x) for x in np.array_split(v, 3))
    tru = np.quantile(v, QS)
    for m in [a.merge(b).merge(c), a.merge(b.merge(c)), c.merge(a).merge(b)]:
        assert m.n == len(v)
        assert np.max(np.abs(m.quantile(QS) - tru) / tru) < 0.10


def test_serde_roundtrip_exact():
    sk = kll_from_values(_data(20000))
    rt = KLL.deserialize(sk.serialize())
    assert rt.n == sk.n
    assert np.array_equal(rt.quantile(QS), sk.quantile(QS))


def test_nan_ignored_empty_safe():
    sk = KLL()
    assert np.isnan(sk.quantile(0.5))
    sk.update(np.array([np.nan, 1.0, np.nan, 3.0]))
    assert sk.n == 2
    assert 1.0 <= sk.quantile(0.5) <= 3.0


def _total_weight(sk):
    return sum(int(buf.size) << h for h, buf in enumerate(sk.levels))


def test_weight_conservation_under_compaction():
    """Sum of represented weights must equal n exactly after arbitrary
    updates and merges — odd-sized compactions must retain the leftover
    item rather than promote/drop it (published KLL; ADVICE r1)."""
    rng = np.random.default_rng(7)
    sk = KLL(k=32)                       # small k -> many compactions
    n = 0
    for sz in rng.integers(1, 997, size=200):
        sk.update(rng.normal(size=int(sz)))
        n += int(sz)
        assert _total_weight(sk) == sk.n == n
    other = kll_from_values(rng.normal(size=12345), k=32)
    merged = sk.merge(other)
    assert _total_weight(merged) == merged.n == n + 12345


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=2000),
       st.integers(min_value=0, max_value=1999))
def test_property_quantile_within_value_range(xs, cut):
    v = np.asarray(xs)
    sk = kll_from_values(v[: max(1, min(len(v), cut + 1))])
    q = sk.quantile(0.5)
    assert v.min() <= q <= v.max()


# ---------------------------------------------------------------------------
# Misra-Gries frequent items
# ---------------------------------------------------------------------------

def _zipf_items(n=20000, n_keys=500, seed=7):
    rng = np.random.default_rng(seed)
    # zipf-ish: item i with probability ~ 1/(i+1)
    w = 1.0 / np.arange(1, n_keys + 1)
    return [f"k{i}" for i in rng.choice(n_keys, size=n, p=w / w.sum())]


def test_mg_bounds_and_heavy_hitter_retention():
    from collections import Counter

    from drift_detection_pibic___framework_spark.functions.sketches import (
        MisraGries)
    items = _zipf_items()
    true = Counter(items)
    sk = MisraGries(k=16).update(items)
    assert sk.n == len(items)
    assert sk.err <= sk.n / (16 + 1)
    for item, est, upper in sk.topk():
        assert est <= true[item] <= upper
    kept = {x for x, _, _ in sk.topk()}
    for x, c in true.items():
        if c > sk.n / (16 + 1):
            assert x in kept, (x, c)


def test_mg_merge_matches_bounds_and_order():
    from collections import Counter

    from drift_detection_pibic___framework_spark.functions.sketches import (
        MisraGries)
    items = _zipf_items(n=30000)
    true = Counter(items)
    chunks = [items[i::5] for i in range(5)]
    merged = MisraGries(k=16)
    for ch in chunks:
        merged.merge(MisraGries(k=16).update(ch))
    assert merged.n == len(items)
    assert merged.err <= merged.n / 17
    for item, est, upper in merged.topk():
        assert est <= true[item] <= upper
    # the unambiguous top-2 of a zipf stream must surface
    top_true = [x for x, _ in true.most_common(2)]
    kept = [x for x, _, _ in merged.topk()]
    assert set(top_true) <= set(kept)


def test_mg_serde_roundtrip():
    from drift_detection_pibic___framework_spark.functions.sketches import (
        MisraGries)
    sk = MisraGries(k=8).update(_zipf_items(n=5000))
    rt = MisraGries.deserialize(sk.serialize())
    assert (rt.k, rt.n, rt.err, rt.counters) == (
        sk.k, sk.n, sk.err, sk.counters)


def test_mg_spark_paths_match_exact_top(spark, clips):
    from drift_detection_pibic___framework_spark.operators import sketch_agg
    exact = {r["codec"]: r["cnt"]
             for r in clips.groupBy("codec").count()
             .withColumnRenamed("count", "cnt").collect()}
    # global tree-aggregate path: 80%-hot codec must be retained with
    # bracketing bounds
    sk = sketch_agg.tree_aggregate_topk(clips, "codec", k=8)
    top = sk.topk()
    hot = max(exact, key=exact.get)
    assert top[0][0] == hot
    for item, est, upper in top:
        if item in exact:
            assert est <= exact[item] <= upper
    # salted grouped path: per-part summaries observe each part's rows
    per_part = sketch_agg.salted_group_topk(clips, "part", "codec",
                                            n_salts=4, k=8)
    n_rows = {r["part"]: r["cnt"] for r in clips.groupBy("part").count()
              .withColumnRenamed("count", "cnt").collect()}
    assert set(per_part) == {str(p) for p in n_rows}
    for p, s in per_part.items():
        assert s.n == n_rows[int(p)]
