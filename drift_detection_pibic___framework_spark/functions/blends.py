"""Scalar blend/weight kernels from the reference's prediction layer,
as Column expressions (JVM-side, codegen-friendly).

These are the reference's P7/F2/F3 scalar ops (SURVEY §2.2/§2.8):
- trend_adjust: ``pred*0.9 + trend*0.1 if |trend| > 0.1 else pred``
  (/root/reference/utils/StreamProcessor.py:207-208)
- inverse_error_weight: ``1/(err+0.001)``, normalized over a window
  (/root/reference/frameworkClasses/standard_prediction_strategy.py:25-27)
- linear_blend: ``a*(1-t) + b*t`` with ``t = min(cnt/55, 0.7)``
  (/root/reference/frameworkClasses/drift_prediction_strategy.py:12-15)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TREND_THRESHOLD = 0.1
TREND_WEIGHT = 0.1
INV_ERR_EPS = 0.001
BLEND_CAP = 0.7
BLEND_RAMP = 55.0


def trend_adjust(pred: Column, trend: Column) -> Column:
    """StreamProcessor.py:207-208 — blend prediction toward a strong trend."""
    blended = pred * (1.0 - TREND_WEIGHT) + trend * TREND_WEIGHT
    return F.when(F.abs(trend) > TREND_THRESHOLD, blended).otherwise(pred)


def inverse_error_weight(err: Column) -> Column:
    """standard_prediction_strategy.py:25 — unnormalized inverse-error
    weight; normalize by the window sum of this expression."""
    return 1.0 / (err + F.lit(INV_ERR_EPS))


def linear_blend(a: Column, b: Column, cnt: Column) -> Column:
    """drift_prediction_strategy.py:12-15 — ramp from a to b over the
    post-drift collection window, capped at 0.7."""
    t = F.least(cnt / F.lit(BLEND_RAMP), F.lit(BLEND_CAP))
    return a * (1.0 - t) + b * t
