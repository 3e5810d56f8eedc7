"""Regime identification — reference T6
(/root/reference/frameworkDetector/framework_detector.py:215-246).

The reference keeps a module-level growing list of window summary vectors
(mean/var of each feature column + mean/var of y) and re-fits
KMeans(k, random_state=42, n_init=10) on ALL accumulated summaries at every
call, then predicts the current window's regime.  Our table-scale mapping
(SURVEY §2.9 T6): the summary vector is computed per Iceberg partition by a
single Spark aggregation (one tiny row per partition), and KMeans runs
driver-side in numpy (k-means is public math; Lloyd's algorithm with a
k-means++-style seeded init) — same semantics, trivial cost at any scale
because the input is one row per partition, never per clip.

The regime id is stamped on the partition's manifest row so that per-regime
verdict context survives resume (the reference's ``pools_por_regime`` dict,
StreamProcessor.py:57, maps to per-regime check state).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

SUMMARY_COLS = ("dur_ms", "sr_hz")


def partition_summaries(clips: DataFrame, cols=SUMMARY_COLS) -> DataFrame:
    """One summary vector per partition: mean + population variance of each
    monitored column (the reference's np.mean/np.var axis=0 concat,
    framework_detector.py:224-229)."""
    aggs = []
    for c in cols:
        aggs += [F.avg(c).alias(f"{c}_mean"),
                 F.var_pop(c).alias(f"{c}_var")]
    return clips.groupBy("part").agg(*aggs).orderBy("part")


def _kmeans(x: np.ndarray, k: int, seed: int = 42, n_init: int = 10,
            iters: int = 100) -> tuple:
    """Seeded Lloyd's k-means with greedy farthest-point init, best of
    n_init restarts (deterministic: all randomness from `seed`)."""
    rng = np.random.default_rng(seed)
    best_labels, best_centers, best_inertia = None, None, np.inf
    for trial in range(n_init):
        # k-means++-style: first center random, rest by D^2 sampling
        centers = [x[rng.integers(len(x))]]
        while len(centers) < k:
            d2 = np.min(
                [np.sum((x - c) ** 2, axis=1) for c in centers], axis=0)
            p = d2 / d2.sum() if d2.sum() > 0 else None
            centers.append(x[rng.choice(len(x), p=p)])
        c = np.array(centers)
        for _ in range(iters):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            labels = d.argmin(axis=1)
            newc = np.array([
                x[labels == j].mean(axis=0) if np.any(labels == j) else c[j]
                for j in range(k)])
            if np.allclose(newc, c):
                break
            c = newc
        inertia = float(((x - c[labels]) ** 2).sum())
        if inertia < best_inertia:
            best_labels, best_centers, best_inertia = labels, c, inertia
    return best_labels, best_centers, best_inertia


def identify_regimes(clips: DataFrame, k: int = 2, cols=SUMMARY_COLS,
                     seed: int = 42,
                     max_fit_summaries: int = 100_000) -> dict:
    """part -> regime id. Summaries are z-scored before clustering (the
    reference scales features with its fitted StandardScaler,
    framework_detector.py:27-31). Regime ids are canonicalized by order of
    first appearance along the partition sequence, so ids are stable across
    runs regardless of init randomness.

    ``max_fit_summaries`` caps the driver-side REFIT (VERDICT r4 ask #8):
    the summaries are one row per partition — fine to collect at 10^5
    partitions, but the Lloyd's refit is O(parts·k·iters·n_init) and at
    10^7 partitions that dominates.  Above the cap the fit runs on a
    deterministic md5-ordered sample (a keyed reservoir: stable across
    runs and under partition appends, no RNG state to carry), and every
    partition is then assigned to its nearest fitted center in one
    vectorized O(parts·k) pass — the same order of work as stamping the
    manifest rows, which is already per-partition.  Below the cap the
    exact original labels are used (bit-identical to prior behavior)."""
    pdf = partition_summaries(clips, cols).toPandas()
    x = pdf.drop(columns=["part"]).to_numpy(dtype=np.float64)
    mu = x.mean(axis=0)
    sd = x.std(axis=0)
    sd[sd == 0] = 1.0
    xz = (x - mu) / sd
    if len(pdf) > max_fit_summaries:
        import hashlib
        order = np.argsort([
            hashlib.md5(f"regime:{int(p)}".encode()).hexdigest()
            for p in pdf["part"]], kind="stable")
        _fl, centers, _i = _kmeans(xz[order[:max_fit_summaries]],
                                   k=k, seed=seed)
        d = ((xz[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        labels = d.argmin(axis=1)
    else:
        labels, _c, _i = _kmeans(xz, k=k, seed=seed)
    remap: dict = {}
    out = {}
    for part, lab in zip(pdf["part"], labels):
        if lab not in remap:
            remap[lab] = len(remap)
        out[int(part)] = remap[lab]
    return out
