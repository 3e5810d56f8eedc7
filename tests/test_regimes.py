"""Regime identification (reference T6): the dur_ms mean shift at p8 must
split the 16 fixture partitions into exactly the two known regimes."""

import numpy as np

from drift_detection_pibic___framework_spark.plans import regimes


def test_two_regimes_split_at_drift_point(spark, clips):
    r = regimes.identify_regimes(clips, k=2)
    assert set(r) == set(range(16))
    # canonicalized by first appearance: baseline regime is 0
    assert all(r[p] == 0 for p in range(8)), r
    assert all(r[p] == 1 for p in range(8, 16)), r


def test_regime_ids_deterministic(spark, clips):
    assert regimes.identify_regimes(clips, k=2) == \
        regimes.identify_regimes(clips, k=2)


def test_kmeans_recovers_planted_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.1, (50, 3))
    b = rng.normal(5, 0.1, (30, 3))
    x = np.vstack([a, b])
    labels, centers, inertia = regimes._kmeans(x, k=2)
    assert len(set(labels[:50])) == 1 and len(set(labels[50:])) == 1
    assert labels[0] != labels[-1]
    assert inertia < 10.0


def test_capped_fit_matches_full_fit_on_separated_clusters(spark, clips):
    """Above max_fit_summaries the fit runs on a deterministic sample and
    labels come from nearest-center assignment: on the fixture's
    well-separated regimes the capped path must (a) be deterministic and
    (b) agree with the uncapped labels, because any decent subsample
    recovers the same two centers.  (Canonicalization keeps ids
    comparable across the two paths.)"""
    full = regimes.identify_regimes(clips, k=2)
    capped = regimes.identify_regimes(clips, k=2, max_fit_summaries=6)
    assert capped == regimes.identify_regimes(clips, k=2,
                                              max_fit_summaries=6)
    assert capped == full
