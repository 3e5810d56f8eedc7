"""Per-detector suite configuration for the fixture corpus.

Defaults follow the published/river parameterizations; the two deviations are
driven by the FIXTURES.md golden rule "the no_drift stream yields zero flags
for every detector" on continuous |N(0,0.05)| error streams:

* KSWIN ``alpha=1e-4`` — at river's 0.005 (or the reference demo's 0.05,
  framework_demonstration.ipynb cell 22) KSWIN flags stationary noise by
  design (its published false-positive rate ~= alpha per test);
* EDDM ``bin_threshold=0.15`` (~3 sigma) — EDDM monitors gaps BETWEEN error
  events; with the DDM threshold 0.05 every third sample is an 'error' and
  the gap statistics saturate.  DDM itself keeps the reference's 0.05
  (/root/reference/detectores/DDMDetector.py:5).
"""

from __future__ import annotations

from . import oracle

DETECTOR_SUITE = {
    "ddm": {"params": {}, "bin_threshold": oracle.DDM_THRESHOLD},
    "eddm": {"params": {}, "bin_threshold": 0.15},
    "adwin": {"params": {"delta": 0.002}, "bin_threshold": oracle.DDM_THRESHOLD},
    "page_hinkley": {"params": {}, "bin_threshold": oracle.DDM_THRESHOLD},
    "kswin": {"params": {"alpha": 1e-4, "window_size": 100, "stat_size": 30,
                         "seed": 42},
              "bin_threshold": oracle.DDM_THRESHOLD},
    "fhddm": {"params": {}, "bin_threshold": oracle.DDM_THRESHOLD},
    "hddm_a": {"params": {}, "bin_threshold": oracle.DDM_THRESHOLD},
    "hddm_w": {"params": {}, "bin_threshold": oracle.DDM_THRESHOLD},
}


def suite_kwargs(name: str) -> dict:
    cfg = DETECTOR_SUITE[name]
    return {"params": cfg["params"], "bin_threshold": cfg["bin_threshold"]}
