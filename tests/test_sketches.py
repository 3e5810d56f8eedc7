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
