"""The check-suite registry — ONE definition site for the validation
suite (SURVEY §2.10 U1 "Check protocol").

Round 1 had four hand-maintained copies of the same unionByName suite
(runner, jobs/validate, streaming, bench — VERDICT r1 missing #6); adding
a check meant editing all four.  Each check here pairs a verdict builder
with its violation builder (the reference's per-check pass/fail + violation
rows contract, north_rule) plus flags describing where it can run:

- ``streaming_safe``: computable inside a single micro-batch (no global
  baseline or cross-batch scan needed);
- ``needs_baseline``: consumes the baseline window (distribution drift).

Every consumer (batch runner, spark-submit job, structured-streaming
front-end, bench) builds its suite from ``CHECKS`` via the helpers below.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Callable, Optional

from pyspark.sql import DataFrame

from ..operators import drift_dist, referential, stats, uniqueness


@dataclass
class CheckContext:
    """Inputs a check may consume. ``stats`` is the shared per-partition
    stats frame so the whole suite costs ONE aggregation pass."""
    clips: DataFrame
    dim: DataFrame
    stats: DataFrame
    baseline: Optional[DataFrame] = None
    baseline_parts: tuple = field(
        default_factory=lambda: tuple(drift_dist.DEFAULT_BASELINE_PARTS))


@dataclass(frozen=True)
class Check:
    name: str                                   # emitted check_name
    verdicts: Callable[[CheckContext], DataFrame]
    violations: Optional[Callable[[CheckContext], DataFrame]]
    streaming_safe: bool
    needs_baseline: bool = False


CHECKS: tuple = (
    Check("null_rate(transcript)",
          lambda c: stats.null_rate_verdicts(c.stats),
          lambda c: stats.null_violations(c.clips),
          streaming_safe=True),
    Check("range(sr_hz)",
          lambda c: stats.range_verdicts(c.stats, "sr_hz", 8000, 48000),
          lambda c: stats.range_violations(c.clips, "sr_hz", 8000, 48000),
          streaming_safe=True),
    Check("unique(clip_id)",
          lambda c: uniqueness.uniqueness_verdicts(c.clips),
          lambda c: uniqueness.duplicate_violations(c.clips),
          streaming_safe=False),      # a partition may span micro-batches
    Check("referential(codec)",
          lambda c: referential.referential_verdicts(c.clips, c.dim),
          lambda c: referential.referential_violations(c.clips, c.dim),
          streaming_safe=True),
    Check("dist_drift(dur_ms)",
          lambda c: drift_dist.drift_verdicts(
              c.clips, baseline=c.baseline,
              baseline_parts=c.baseline_parts),
          None,
          streaming_safe=False, needs_baseline=True),
)


def _union(dfs: list) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), dfs)


def make_context(clips: DataFrame, dim: DataFrame,
                 baseline: DataFrame = None,
                 baseline_parts=None, st: DataFrame = None) -> CheckContext:
    return CheckContext(
        clips=clips, dim=dim,
        stats=st if st is not None else stats.partition_column_stats(clips),
        baseline=baseline,
        baseline_parts=(tuple(baseline_parts) if baseline_parts is not None
                        else tuple(drift_dist.DEFAULT_BASELINE_PARTS)))


def suite_verdicts(clips: DataFrame, dim: DataFrame,
                   baseline: DataFrame = None, baseline_parts=None,
                   st: DataFrame = None) -> DataFrame:
    """All checks' per-partition verdict rows (one stats pass shared)."""
    ctx = make_context(clips, dim, baseline, baseline_parts, st)
    return _union([c.verdicts(ctx) for c in CHECKS])


def suite_violations(clips: DataFrame, dim: DataFrame) -> DataFrame:
    """All checks' violation rows (clip_id, check_name, observed,
    expected, part)."""
    ctx = make_context(clips, dim)
    return _union([c.violations(ctx) for c in CHECKS if c.violations])


def streaming_suite_verdicts(batch: DataFrame, dim: DataFrame) -> DataFrame:
    """The micro-batch-safe subset (drift vs baseline and cross-batch
    uniqueness are owned by the batch runner)."""
    ctx = make_context(batch, dim)
    return _union([c.verdicts(ctx) for c in CHECKS if c.streaming_safe])
