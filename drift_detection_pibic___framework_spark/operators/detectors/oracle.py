"""Single-node drift-detector oracles (numpy, row-at-a-time).

The reference wraps river detectors behind a 2-method protocol —
``atualizar(erro)`` / ``drift_detectado`` (/root/reference/detectores/
DetectorDriftBase.py:3-14) — with one semantic addition: DDM binarizes the
error against threshold=0.05 (/root/reference/detectores/DDMDetector.py:5,
10-12).  river is unavailable offline, so each detector here is re-derived
from its published algorithm (the same sources river implements):

  DDM          Gama et al. 2004, "Learning with Drift Detection"
  EDDM         Baena-García et al. 2006, "Early Drift Detection Method"
  ADWIN        Bifet & Gavaldà 2007, "Learning from Time-Changing Data
               with Adaptive Windowing"
  PageHinkley  Page 1954, "Continuous Inspection Schemes"
  KSWIN        Raab et al. 2020, "Reactive Soft Prototype Computing for
               Concept Drift Streams"
  FHDDM        Pesaranghader & Viktor 2016, "Fast Hoeffding Drift Detection"
  HDDM_A/W     Frías-Blanco et al. 2015, "Online and Non-Parametric Drift
               Detection Methods Based on Hoeffding's Bounds"

Semantics preserved from the reference harness:
- auto-reset after a drift signal (river behavior, relied on by
  /root/reference/avaliacao/DriftEvaluator.py:104-123);
- ``drift_detected`` / ``warning_detected`` reflect the LAST update only
  (consumed at /root/reference/frameworkDetector/framework_detector.py:134-147
  for the NORMAL/ALERTA/MUDANÇA 3-state mapping);
- KSWIN is seeded (documented deviation: river samples its window
  un-seedably; SURVEY §7.3).

These oracles pin the golden flag sequences; the Spark kernels in
``kernels.py`` must reproduce them exactly.
"""

from __future__ import annotations

import math

import numpy as np

STATE_NORMAL = "NORMAL"
STATE_WARNING = "ALERTA"
STATE_DRIFT = "MUDANÇA"


class BaseDetector:
    """update(x) once per sample; flags reflect the last update."""

    def __init__(self):
        self.drift_detected = False
        self.warning_detected = False

    def update(self, x: float) -> None:
        raise NotImplementedError

    def state(self) -> str:
        """3-state mapping per framework_detector.py:134-147."""
        if self.drift_detected:
            return STATE_DRIFT
        if self.warning_detected:
            return STATE_WARNING
        return STATE_NORMAL


# ---------------------------------------------------------------------------
# DDM — binary error-rate monitor (Gama'04)
# ---------------------------------------------------------------------------

class DDM(BaseDetector):
    """Reference wrapper binarizes: x_bin = 1 if erro > threshold else 0
    (DDMDetector.py:10-12). Binarization happens in the harness, not here —
    this class consumes {0,1} like river's DDM."""

    def __init__(self, warm_start: int = 30, warning_threshold: float = 2.0,
                 drift_threshold: float = 3.0):
        super().__init__()
        self.warm_start = warm_start
        self.warning_threshold = warning_threshold
        self.drift_threshold = drift_threshold
        self._reset()

    def _reset(self):
        self.n = 0
        self.p = 1.0
        self.s = 0.0
        self.psmin = float("inf")
        self.pmin = float("inf")
        self.smin = float("inf")

    def update(self, x) -> None:
        self.drift_detected = False
        self.warning_detected = False
        x = float(x)
        self.n += 1
        self.p += (x - self.p) / self.n
        self.s = math.sqrt(max(self.p * (1.0 - self.p), 0.0) / self.n)
        if self.n < self.warm_start:
            return
        if self.p + self.s <= self.psmin:
            self.pmin = self.p
            self.smin = self.s
            self.psmin = self.p + self.s
        if self.p + self.s > self.pmin + self.drift_threshold * self.smin:
            self.drift_detected = True
            self._reset()
        elif self.p + self.s > self.pmin + self.warning_threshold * self.smin:
            self.warning_detected = True


# ---------------------------------------------------------------------------
# EDDM — distance-between-errors monitor (Baena-García'06)
# ---------------------------------------------------------------------------

class EDDM(BaseDetector):
    """Consumes {0,1}; monitors the mean+2std of the gap between errors."""

    def __init__(self, warm_start: int = 30, alpha: float = 0.95,
                 beta: float = 0.9):
        super().__init__()
        self.warm_start = warm_start
        self.alpha = alpha
        self.beta = beta
        self._reset()

    def _reset(self):
        self.i = 0
        self.last_error = None
        self.n_errors = 0
        self.dist_mean = 0.0
        self.dist_m2 = 0.0
        self.max_m2s = 0.0

    def update(self, x) -> None:
        self.drift_detected = False
        self.warning_detected = False
        self.i += 1
        if float(x) != 1.0:
            return
        if self.last_error is not None:
            dist = self.i - self.last_error
            self.n_errors += 1
            d = dist - self.dist_mean
            self.dist_mean += d / self.n_errors
            self.dist_m2 += d * (dist - self.dist_mean)
        self.last_error = self.i
        if self.n_errors < 2:
            return
        var = self.dist_m2 / (self.n_errors - 1)
        m2s = self.dist_mean + 2.0 * math.sqrt(max(var, 0.0))
        if self.n_errors < self.warm_start:
            self.max_m2s = max(self.max_m2s, m2s)
            return
        if m2s > self.max_m2s:
            self.max_m2s = m2s
            return
        ratio = m2s / self.max_m2s if self.max_m2s > 0 else 1.0
        if ratio < self.beta:
            self.drift_detected = True
            self._reset()
        elif ratio < self.alpha:
            self.warning_detected = True


# ---------------------------------------------------------------------------
# ADWIN — adaptive windowing with exponential bucket histogram (Bifet'07)
# ---------------------------------------------------------------------------

class _BucketRow:
    """Row of up to max_buckets+1 buckets, each holding 2^level items."""

    __slots__ = ("totals", "variances", "count")

    def __init__(self, cap: int):
        self.totals = [0.0] * cap
        self.variances = [0.0] * cap
        self.count = 0


class ADWIN(BaseDetector):
    """Faithful MOA/paper structure: exponential histogram compression,
    cut check every ``clock`` items over all bucket boundaries using the
    variance-aware Hoeffding bound with delta' = delta / ln(n)."""

    MAX_BUCKETS = 5
    MIN_WINDOW_LEN = 5
    GRACE = 10
    CLOCK = 32

    def __init__(self, delta: float = 0.002):
        super().__init__()
        self.delta = delta
        self._reset()

    def _reset(self):
        cap = self.MAX_BUCKETS + 1
        self.rows = [_BucketRow(cap)]
        self.width = 0
        self.total = 0.0
        self.variance = 0.0
        self.ticks = 0

    # -- histogram maintenance ------------------------------------------

    def _insert(self, x: float):
        row = self.rows[0]
        # shift right, insert at slot 0? paper inserts newest at front of row 0
        row.totals[row.count] = x
        row.variances[row.count] = 0.0
        row.count += 1
        self.width += 1
        if self.width > 1:
            mean = self.total / (self.width - 1)
            self.variance += (self.width - 1) * (x - mean) ** 2 / self.width
        self.total += x
        self._compress()

    def _compress(self):
        level = 0
        while level < len(self.rows):
            row = self.rows[level]
            if row.count <= self.MAX_BUCKETS:
                break
            if level + 1 == len(self.rows):
                self.rows.append(_BucketRow(self.MAX_BUCKETS + 1))
            nxt = self.rows[level + 1]
            n = float(1 << level)
            u1 = row.totals[0] / n
            u2 = row.totals[1] / n
            merged_total = row.totals[0] + row.totals[1]
            incr_var = n * n * (u1 - u2) ** 2 / (2 * n)
            merged_var = row.variances[0] + row.variances[1] + incr_var
            nxt.totals[nxt.count] = merged_total
            nxt.variances[nxt.count] = merged_var
            nxt.count += 1
            # drop the two oldest (slots 0,1) from this row
            for i in range(2, row.count):
                row.totals[i - 2] = row.totals[i]
                row.variances[i - 2] = row.variances[i]
            row.count -= 2
            level += 1

    def _delete_oldest(self):
        level = len(self.rows) - 1
        row = self.rows[level]
        n = 1 << level
        u = row.totals[0] / n
        mean = self.total / self.width
        self.width -= n
        self.total -= row.totals[0]
        incr_var = row.variances[0] + n * self.width / (n + self.width) * (u - (self.total / self.width if self.width else 0.0)) ** 2 if self.width else 0.0
        self.variance -= incr_var
        self.variance = max(self.variance, 0.0)
        for i in range(1, row.count):
            row.totals[i - 1] = row.totals[i]
            row.variances[i - 1] = row.variances[i]
        row.count -= 1
        if row.count == 0 and len(self.rows) > 1:
            self.rows.pop()
        _ = mean
        return n

    # -- detection ----------------------------------------------------------

    def update(self, x) -> None:
        self.drift_detected = False
        self.warning_detected = False
        self.ticks += 1
        self._insert(float(x))
        if self.ticks % self.CLOCK != 0 or self.width <= self.GRACE:
            return
        reduced = True
        while reduced:
            reduced = False
            n0, sum0 = 0.0, 0.0
            n1, sum1 = float(self.width), self.total
            if self.width <= 1:
                break
            var_w = self.variance / self.width
            dd = math.log(2.0 * math.log(max(self.width, 2)) / self.delta)
            # iterate oldest bucket -> newest
            for level in range(len(self.rows) - 1, -1, -1):
                row = self.rows[level]
                bsz = float(1 << level)
                for k in range(row.count):
                    n0 += bsz
                    sum0 += row.totals[k]
                    n1 -= bsz
                    sum1 -= row.totals[k]
                    if n0 < self.MIN_WINDOW_LEN or n1 < self.MIN_WINDOW_LEN:
                        continue
                    m = 1.0 / (n0 - self.MIN_WINDOW_LEN + 1) + \
                        1.0 / (n1 - self.MIN_WINDOW_LEN + 1)
                    eps = math.sqrt(2.0 * m * var_w * dd) + (2.0 / 3.0) * dd * m
                    if abs(sum0 / n0 - sum1 / n1) > eps:
                        # drop the oldest bucket and re-check
                        self.drift_detected = True
                        if self.width > self.MIN_WINDOW_LEN:
                            self._delete_oldest()
                            reduced = True
                        break
                if reduced:
                    break


# ---------------------------------------------------------------------------
# Page-Hinkley (Page'54; river parameterization)
# ---------------------------------------------------------------------------

class PageHinkley(BaseDetector):
    """Two-sided cumulative test with forgetting factor alpha."""

    def __init__(self, min_instances: int = 30, delta: float = 0.005,
                 threshold: float = 50.0, alpha: float = 0.9999):
        super().__init__()
        self.min_instances = min_instances
        self.delta = delta
        self.threshold = threshold
        self.alpha = alpha
        self._reset()

    def _reset(self):
        self.n = 0
        self.mean = 0.0
        self.sum_inc = 0.0
        self.sum_dec = 0.0

    def update(self, x) -> None:
        self.drift_detected = False
        self.warning_detected = False
        x = float(x)
        self.n += 1
        self.mean += (x - self.mean) / self.n
        self.sum_inc = max(0.0, self.alpha * self.sum_inc + (x - self.mean - self.delta))
        self.sum_dec = min(0.0, self.alpha * self.sum_dec + (x - self.mean + self.delta))
        if self.n < self.min_instances:
            return
        if self.sum_inc > self.threshold or self.sum_dec < -self.threshold:
            self.drift_detected = True
            self._reset()


# ---------------------------------------------------------------------------
# KSWIN (Raab'20) — seeded variant
# ---------------------------------------------------------------------------

def ks_2samp(a: np.ndarray, b: np.ndarray) -> tuple:
    """Two-sample Kolmogorov-Smirnov statistic + asymptotic p-value
    (Kolmogorov distribution via the Numerical-Recipes series — public)."""
    a = np.sort(np.asarray(a, dtype=np.float64))
    b = np.sort(np.asarray(b, dtype=np.float64))
    allv = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, allv, side="right") / a.size
    cdf_b = np.searchsorted(b, allv, side="right") / b.size
    d = float(np.max(np.abs(cdf_a - cdf_b)))
    en = math.sqrt(a.size * b.size / (a.size + b.size))
    lam = (en + 0.12 + 0.11 / en) * d
    if lam < 1e-3:  # series diverges numerically; limit is p=1
        return d, 1.0
    p = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        p += term
        if abs(term) < 1e-10:
            break
    return d, float(min(max(p, 0.0), 1.0))


class KSWIN(BaseDetector):
    """Sliding window w; KS test of the stat_size newest vs a uniform sample
    of stat_size from the rest. Deterministic: seeded rng (documented
    deviation from river, SURVEY §7.3). Reference demo params:
    alpha=0.05, window_size=100 (framework_demonstration.ipynb cell 22)."""

    def __init__(self, alpha: float = 0.005, window_size: int = 100,
                 stat_size: int = 30, seed: int = 42):
        super().__init__()
        self.alpha = alpha
        self.window_size = window_size
        self.stat_size = stat_size
        self.rng = np.random.default_rng(seed)
        self.window: list = []

    def update(self, x) -> None:
        self.drift_detected = False
        self.warning_detected = False
        self.window.append(float(x))
        if len(self.window) > self.window_size:
            self.window.pop(0)
        if len(self.window) < self.window_size:
            return
        recent = np.array(self.window[-self.stat_size:])
        rest = np.array(self.window[:-self.stat_size])
        sample = self.rng.choice(rest, size=self.stat_size, replace=False)
        d, p = ks_2samp(sample, recent)
        if p <= self.alpha and d > 0.1:
            self.drift_detected = True
            self.window = self.window[-self.stat_size:]


# ---------------------------------------------------------------------------
# FHDDM (Pesaranghader'16)
# ---------------------------------------------------------------------------

class FHDDM(BaseDetector):
    """Sliding window of binary errors; drift when the in-window probability
    of CORRECT (x==0) drops from its maximum by the Hoeffding bound."""

    def __init__(self, window_size: int = 100, delta: float = 1e-7):
        super().__init__()
        self.window_size = window_size
        self.delta = delta
        self.eps = math.sqrt(math.log(1.0 / delta) / (2.0 * window_size))
        self._reset()

    def _reset(self):
        self.window: list = []
        self.p_max = 0.0

    def update(self, x) -> None:
        self.drift_detected = False
        self.warning_detected = False
        self.window.append(0.0 if float(x) == 1.0 else 1.0)  # 1 = correct
        if len(self.window) > self.window_size:
            self.window.pop(0)
        if len(self.window) < self.window_size:
            return
        p = sum(self.window) / len(self.window)
        if p > self.p_max:
            self.p_max = p
        if self.p_max - p > self.eps:
            self.drift_detected = True
            self._reset()


# ---------------------------------------------------------------------------
# HDDM_A (Frías-Blanco'15, Hoeffding bound on raw averages)
# ---------------------------------------------------------------------------

class HDDM_A(BaseDetector):
    def __init__(self, drift_confidence: float = 0.001,
                 warning_confidence: float = 0.005,
                 two_sided: bool = False):
        super().__init__()
        self.drift_confidence = drift_confidence
        self.warning_confidence = warning_confidence
        self.two_sided = two_sided
        self._reset()

    def _reset(self):
        self.total_n = 0
        self.total_c = 0.0
        self.n_min = 0
        self.c_min = 0.0
        self.n_max = 0
        self.c_max = 0.0

    @staticmethod
    def _mean_incr(c_min, n_min, total_c, total_n, conf) -> bool:
        if n_min == total_n or total_n - n_min == 0:
            return False
        m = (total_n - n_min) / n_min * (1.0 / total_n)
        bound = math.sqrt(m / 2.0 * math.log(2.0 / conf))
        return total_c / total_n - c_min / n_min >= bound

    @staticmethod
    def _mean_decr(c_max, n_max, total_c, total_n, conf) -> bool:
        if n_max == total_n or total_n - n_max == 0:
            return False
        m = (total_n - n_max) / n_max * (1.0 / total_n)
        bound = math.sqrt(m / 2.0 * math.log(2.0 / conf))
        return c_max / n_max - total_c / total_n >= bound

    def update(self, x) -> None:
        self.drift_detected = False
        self.warning_detected = False
        x = float(x)
        self.total_n += 1
        self.total_c += x
        if self.n_min == 0:
            self.n_min, self.c_min = self.total_n, self.total_c
        if self.n_max == 0:
            self.n_max, self.c_max = self.total_n, self.total_c

        conf = self.drift_confidence
        cota = math.sqrt(1.0 / (2 * self.n_min) * math.log(1.0 / conf))
        cota1 = math.sqrt(1.0 / (2 * self.total_n) * math.log(1.0 / conf))
        if self.c_min / self.n_min + cota >= self.total_c / self.total_n + cota1:
            self.c_min, self.n_min = self.total_c, self.total_n
        cota = math.sqrt(1.0 / (2 * self.n_max) * math.log(1.0 / conf))
        if self.c_max / self.n_max - cota <= self.total_c / self.total_n - cota1:
            self.c_max, self.n_max = self.total_c, self.total_n

        if self._mean_incr(self.c_min, self.n_min, self.total_c, self.total_n,
                           self.drift_confidence):
            self.drift_detected = True
            self._reset()
        elif self.two_sided and self._mean_decr(
                self.c_max, self.n_max, self.total_c, self.total_n,
                self.drift_confidence):
            self.drift_detected = True
            self._reset()
        elif self._mean_incr(self.c_min, self.n_min, self.total_c,
                             self.total_n, self.warning_confidence):
            self.warning_detected = True


# ---------------------------------------------------------------------------
# HDDM_W (Frías-Blanco'15, EWMA-weighted McDiarmid bounds)
# ---------------------------------------------------------------------------

class _Sample:
    __slots__ = ("ewma", "ibcs")

    def __init__(self):
        self.ewma = -1.0
        self.ibcs = 1.0  # independent bounded condition sum

    def copy(self):
        s = _Sample()
        s.ewma, s.ibcs = self.ewma, self.ibcs
        return s


class HDDM_W(BaseDetector):
    def __init__(self, drift_confidence: float = 0.001,
                 warning_confidence: float = 0.005,
                 lambda_: float = 0.05, two_sided: bool = False):
        super().__init__()
        self.drift_confidence = drift_confidence
        self.warning_confidence = warning_confidence
        self.lambda_ = lambda_
        self.two_sided = two_sided
        self._reset()

    def _reset(self):
        self.total = _Sample()
        self.s1_incr = _Sample()
        self.s2_incr = _Sample()
        self.s1_decr = _Sample()
        self.s2_decr = _Sample()
        self.incr_cut = float("inf")
        self.decr_cut = float("-inf")

    def _ewma_update(self, s: _Sample, value: float):
        decay = 1.0 - self.lambda_
        if s.ewma < 0:
            s.ewma = value
            s.ibcs = 1.0
        else:
            s.ewma = self.lambda_ * value + decay * s.ewma
            s.ibcs = self.lambda_ * self.lambda_ + decay * decay * s.ibcs

    @staticmethod
    def _mean_diff(s1: _Sample, s2: _Sample, conf: float) -> bool:
        if s1.ewma < 0 or s2.ewma < 0:
            return False
        bound = math.sqrt((s1.ibcs + s2.ibcs) / 2.0 * math.log(1.0 / conf))
        return s2.ewma - s1.ewma > bound

    def update(self, x) -> None:
        self.drift_detected = False
        self.warning_detected = False
        x = float(x)
        self._ewma_update(self.total, x)

        # increase monitor
        bound = math.sqrt(self.total.ibcs / 2.0 *
                          math.log(1.0 / self.drift_confidence))
        if self.total.ewma + bound < self.incr_cut:
            self.incr_cut = self.total.ewma + bound
            self.s1_incr = self.total.copy()
            self.s2_incr = _Sample()
        else:
            self._ewma_update(self.s2_incr, x)

        # decrease monitor
        if self.total.ewma - bound > self.decr_cut:
            self.decr_cut = self.total.ewma - bound
            self.s1_decr = self.total.copy()
            self.s2_decr = _Sample()
        else:
            self._ewma_update(self.s2_decr, x)

        if self._mean_diff(self.s1_incr, self.s2_incr, self.drift_confidence):
            self.drift_detected = True
            self._reset()
        elif self.two_sided and self._mean_diff(
                self.s2_decr, self.s1_decr, self.drift_confidence):
            self.drift_detected = True
            self._reset()
        elif self._mean_diff(self.s1_incr, self.s2_incr,
                             self.warning_confidence):
            self.warning_detected = True


DETECTORS = {
    "ddm": DDM,
    "eddm": EDDM,
    "adwin": ADWIN,
    "page_hinkley": PageHinkley,
    "kswin": KSWIN,
    "fhddm": FHDDM,
    "hddm_a": HDDM_A,
    "hddm_w": HDDM_W,
}

# detectors whose input is the binarized error (DDMDetector.py:10-12 feeds
# DDM a {0,1}; EDDM/FHDDM/HDDM consume binary 'classifier was wrong' signals
# — in the reference they receive the raw error, which for EDDM/FHDDM/HDDM_A
# behaves as a rate only after binarization; we binarize uniformly at the
# harness with the reference's threshold)
BINARY_INPUT = {"ddm", "eddm", "fhddm", "hddm_a"}
DDM_THRESHOLD = 0.05  # DDMDetector.py:5
