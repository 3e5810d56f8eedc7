"""Mergeable quantile sketch (KLL) in pure numpy.

The north_rule names KLL-sketch quantiles of ``sr_hz``/``dur_ms`` explicitly.
Spark's built-in ``percentile_approx`` (GK-based) covers the SQL surface; this
module provides the *mergeable summary* used by the salted two-phase
``treeAggregate`` path (SURVEY §4 "salted two-phase aggregation"), where
partial sketches built per input split are merged associatively on the way to
the driver.

Implementation follows the published KLL algorithm (Karnin, Lang, Liberty,
"Optimal Quantile Approximation in Streams", FOCS 2016): a hierarchy of
buffers; level h holds items with weight 2^h; a full level is sorted and
every other item (random offset) is promoted to level h+1.  Deterministic
variant: the compaction offset comes from a counter-seeded RNG so results are
reproducible (sandbox rule: everything seeded).

Serialization: plain ``bytes`` via numpy buffers — safe to carry through a
Spark BinaryType column or ``RDD.treeAggregate``.
"""

from __future__ import annotations

import struct

import numpy as np

_DEF_K = 200


class KLL:
    """KLL quantile sketch over float64 values."""

    __slots__ = ("k", "levels", "n", "_rng_counter")

    def __init__(self, k: int = _DEF_K):
        self.k = int(k)
        self.levels: list = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng_counter = 0

    # -- sizing ---------------------------------------------------------

    def _capacity(self, level: int, num_levels: int) -> int:
        # capacity shrinks geometrically for lower levels (c = 2/3)
        depth = num_levels - level - 1
        cap = int(np.ceil(self.k * (2.0 / 3.0) ** depth))
        return max(cap, 8)

    # -- updates ----------------------------------------------------------

    def update(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _coin(self) -> int:
        self._rng_counter += 1
        rng = np.random.default_rng(
            np.random.SeedSequence([2654435761, self._rng_counter, self.n]))
        return int(rng.integers(0, 2))

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            cap = self._capacity(h, len(self.levels))
            buf = self.levels[h]
            if buf.size <= cap:
                h += 1
                continue
            buf = np.sort(buf)
            # odd-sized buffer: retain the leftover item at level h and
            # compact only the even-sized remainder, so promoted weight
            # (pairs -> one item of weight 2^(h+1)) exactly equals the
            # weight removed; compacting an odd buffer whole would change
            # total represented weight by +-2^h while n stays fixed
            # (published KLL keeps the leftover item).
            if buf.size % 2:
                kept = buf[-1:]
                buf = buf[:-1]
            else:
                kept = buf[:0]
            off = self._coin()
            promoted = buf[off::2]
            self.levels[h] = kept
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            h += 1

    # -- merge (associative, commutative — property-tested) ---------------

    def merge(self, other: "KLL") -> "KLL":
        out = KLL(max(self.k, other.k))
        out.n = self.n + other.n
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for h in range(depth):
            a = self.levels[h] if h < len(self.levels) else np.empty(0)
            b = other.levels[h] if h < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
        out._rng_counter = self._rng_counter + other._rng_counter
        out._compress()
        return out

    # -- queries -----------------------------------------------------------

    def _weighted(self) -> tuple:
        items, weights = [], []
        for h, buf in enumerate(self.levels):
            if buf.size:
                items.append(buf)
                weights.append(np.full(buf.size, 1 << h, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q) -> np.ndarray:
        """Approximate quantile(s) q in [0,1]."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        it, w = self._weighted()
        if it.size == 0:
            return np.full(qs.shape, np.nan)
        cw = np.cumsum(w)
        ranks = np.clip(qs * cw[-1], 1, cw[-1])
        idx = np.searchsorted(cw, ranks, side="left")
        out = it[np.minimum(idx, it.size - 1)]
        return out if np.ndim(q) else np.float64(out[0])

    # -- serialization -------------------------------------------------------

    def serialize(self) -> bytes:
        head = struct.pack("<iqqi", self.k, self.n, self._rng_counter,
                           len(self.levels))
        parts = [head]
        for buf in self.levels:
            parts.append(struct.pack("<i", buf.size))
            parts.append(np.ascontiguousarray(buf, dtype="<f8").tobytes())
        return b"".join(parts)

    @staticmethod
    def deserialize(data: bytes) -> "KLL":
        k, n, ctr, nlev = struct.unpack_from("<iqqi", data, 0)
        off = struct.calcsize("<iqqi")
        sk = KLL(k)
        sk.n = n
        sk._rng_counter = ctr
        sk.levels = []
        for _ in range(nlev):
            (sz,) = struct.unpack_from("<i", data, off)
            off += 4
            buf = np.frombuffer(data, dtype="<f8", count=sz, offset=off).copy()
            off += 8 * sz
            sk.levels.append(buf)
        return sk


def kll_from_values(values: np.ndarray, k: int = _DEF_K) -> KLL:
    return KLL(k).update(values)


def _cdf_gap(a: KLL, b: KLL):
    """(support, F_a - F_b) between two sketches over the union of their
    retained items — both sketch CDFs are step functions, so every
    CDF-comparison statistic (KS sup, W1 integral) is exact on this
    grid.  Returns (None, None) when either sketch is empty."""
    ia, wa = a._weighted()
    ib, wb = b._weighted()
    if ia.size == 0 or ib.size == 0:
        return None, None
    support = np.union1d(ia, ib)
    gap = np.zeros(support.size)
    for items, weights, sign in ((ia, wa, 1.0), (ib, wb, -1.0)):
        cw = np.cumsum(weights)
        idx = np.searchsorted(items, support, side="right")
        gap += sign * np.where(idx > 0, cw[np.maximum(idx - 1, 0)],
                               0) / cw[-1]
    return support, gap


def kll_ks_distance(a: KLL, b: KLL) -> float:
    """Two-sample Kolmogorov-Smirnov statistic sup|F_a - F_b| between two
    KLL sketches, evaluated on the union of their retained items (the
    sketch CDF is a step function, so the supremum is attained there).
    Error is bounded by the sketches' rank-error ε, independent of the
    row counts they summarize — the shape-drift primitive for comparing a
    100-TB baseline to a commit without touching either's raw rows."""
    support, gap = _cdf_gap(a, b)
    if support is None:
        return float("nan")
    return float(np.max(np.abs(gap)))


class MisraGries:
    """Mergeable frequent-items (heavy hitters) summary with ``k`` counters
    (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
    Summaries", PODS 2012: pointwise-add counters, then subtract the
    (k+1)-th largest count and drop non-positives).

    Guarantees, with ``err`` the accumulated decrement total:
    - every estimate undercounts: est(x) <= true(x) <= est(x) + err;
    - err <= n / (k + 1), so any item with true(x) > n / (k + 1) is
      guaranteed retained (the classic heavy-hitter bound);
    - merge is associative and commutative (error bounds add).

    Batch update aggregates the input with a Counter first (one pass,
    C-speed) and then merges — identical bounds, no per-item Python loop
    over already-counted data.
    """

    def __init__(self, k: int = 16):
        self.k = int(k)
        self.counters: dict = {}
        self.n = 0          # total items observed
        self.err = 0        # max undercount of any estimate

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        t = sorted(self.counters.values(), reverse=True)[self.k]
        self.counters = {x: c - t for x, c in self.counters.items()
                         if c > t}
        self.err += t

    def update(self, items) -> "MisraGries":
        from collections import Counter
        batch = Counter(items)
        self.n += sum(batch.values())
        for x, c in batch.items():
            self.counters[x] = self.counters.get(x, 0) + c
        self._shrink()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        assert self.k == other.k, "merge requires equal k"
        for x, c in other.counters.items():
            self.counters[x] = self.counters.get(x, 0) + c
        self.n += other.n
        self.err += other.err
        self._shrink()
        return self

    def topk(self, limit: int = None) -> list:
        """[(item, est, est + err)] sorted by estimate desc, item asc —
        the (lower, upper) bracket of each item's true count."""
        rows = sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(x, c, c + self.err) for x, c in rows[:limit or self.k]]

    def serialize(self) -> bytes:
        import json
        return json.dumps(
            {"k": self.k, "n": self.n, "err": self.err,
             "counters": self.counters}).encode()

    @staticmethod
    def deserialize(data: bytes) -> "MisraGries":
        import json
        d = json.loads(data.decode())
        sk = MisraGries(d["k"])
        sk.n, sk.err = d["n"], d["err"]
        sk.counters = dict(d["counters"])
        return sk


def kll_w1_distance(a: KLL, b: KLL) -> float:
    """Wasserstein-1 (earth-mover) distance between two KLL sketches:
    the integral of |F_a - F_b| over the union of retained items (both
    CDFs are step functions, so the integral is an exact sum of
    rectangle areas between consecutive support points).  The
    magnitude-aware companion of kll_ks_distance — its value reads in
    the COLUMN'S OWN UNITS (how far mass moved, not just that it moved)
    with error bounded by the sketches' rank-error times the support
    span.  Same zero-rescan use: compare a 100-TB baseline fold to a
    commit from sidecar bytes alone."""
    support, gap = _cdf_gap(a, b)
    if support is None:
        return float("nan")
    if support.size < 2:
        return 0.0
    return float(np.sum(np.abs(gap[:-1]) * np.diff(support)))
