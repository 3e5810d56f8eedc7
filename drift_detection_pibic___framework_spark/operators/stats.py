"""Per-partition column statistics + null-rate checks (pure DataFrame API).

Re-expresses the reference's per-window column-stats operator —
``mean(X,axis=0), var(X,axis=0)`` at
/root/reference/frameworkDetector/framework_detector.py:224-229 (regime
feature summaries) and the windowed metrics at
/root/reference/utils/StreamProcessor.py:143-157 — as a single shuffle-free*
``groupBy(part).agg(...)`` over the clips table, extended with
count/null-rate/min/max/quantiles per the north_rule.

*Scale notes (100 TB / 1000 executors):
- ONE aggregation pass computes every stat for every column: partial
  aggregation (map-side combine) means the shuffle carries one row per
  (input-split × part), not per clip.
- Column pruning: the ``bytes`` audio payload is never referenced here, so
  the Parquet scan reads only the small typed columns (verified via
  .explain ReadSchema).
- ``percentile_approx`` is a mergeable GK summary (constant size per
  partition); the KLL path in functions/sketches.py covers the
  treeAggregate variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# columns the stats pass profiles, per north_rule
NUMERIC_COLS = ("sr_hz", "dur_ms")
NULLABLE_COLS = ("transcript", "clip_id", "codec")
QUANTILES = (0.25, 0.5, 0.75, 0.95, 0.99)


def partition_column_stats(clips: DataFrame,
                           numeric_cols=NUMERIC_COLS,
                           nullable_cols=NULLABLE_COLS,
                           quantiles=QUANTILES,
                           round_to: int = 6) -> DataFrame:
    """One row per partition: count + per-column null-rate/mean/stddev/min/
    max/approx-quantiles. Single agg — single shuffle, map-side partials."""
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in numeric_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"),
            F.round(F.avg(c), round_to).alias(f"{c}_mean"),
            F.round(F.stddev_samp(c), round_to).alias(f"{c}_stddev"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
        for q in quantiles:
            aggs.append(
                F.percentile_approx(c, F.lit(q), F.lit(10000))
                .alias(f"{c}_p{int(q * 100)}"))
    for c in nullable_cols:
        aggs.append(
            F.round(F.avg(F.when(F.col(c).isNull(), 1.0).otherwise(0.0)),
                    round_to).alias(f"{c}_null_rate"))
    return clips.groupBy("part").agg(*aggs)


def null_rate_verdicts(stats: DataFrame, col: str = "transcript",
                       max_null_rate: float = 0.005) -> DataFrame:
    """Per-partition pass/fail on a column's null rate (golden matrix:
    p2/p10 fail transcript null-rate at the 0.5% threshold)."""
    rate = F.col(f"{col}_null_rate")
    return stats.select(
        "part",
        F.lit(f"null_rate({col})").alias("check_name"),
        (rate <= F.lit(max_null_rate)).alias("passed"),
        rate.cast("string").alias("observed"),
        F.lit(f"<= {max_null_rate}").alias("expected"),
    )


def null_violations(clips: DataFrame, col: str = "transcript",
                    max_null_rate: float = 0.005) -> DataFrame:
    """Violation rows (clip_id, check_name, observed, expected, part) for
    null values in ``col`` — but ONLY from partitions whose null rate breaches
    the threshold (per-partition verdict granularity, north_rule).

    The failing-partition set is computed as an aggregation and joined back
    broadcast (tiny: <= one row per partition)."""
    failing = (clips.groupBy("part")
               .agg(F.avg(F.when(F.col(col).isNull(), 1.0).otherwise(0.0))
                    .alias("nr"))
               .filter(F.col("nr") > max_null_rate)
               .select("part"))
    return (clips.join(F.broadcast(failing), "part")
            .filter(F.col(col).isNull())
            .select(
                F.col("clip_id"),
                F.lit(f"null_rate({col})").alias("check_name"),
                F.lit("NULL").alias("observed"),
                F.lit("non-null " + col).alias("expected"),
                F.col("part")))


def range_verdicts(stats: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    """Per-partition pass/fail on min/max bounds (e.g. sr_hz in [8000, 48000]
    — the 0.1% injected 192 kHz outliers breach the max)."""
    ok = (F.col(f"{col}_min") >= F.lit(lo)) & (F.col(f"{col}_max") <= F.lit(hi))
    return stats.select(
        "part",
        F.lit(f"range({col})").alias("check_name"),
        ok.alias("passed"),
        F.concat_ws("..", F.col(f"{col}_min").cast("string"),
                    F.col(f"{col}_max").cast("string")).alias("observed"),
        F.lit(f"[{lo}, {hi}]").alias("expected"),
    )


def range_violations(clips: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    bad = (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))
    return clips.filter(bad).select(
        F.col("clip_id"),
        F.lit(f"range({col})").alias("check_name"),
        F.col(col).cast("string").alias("observed"),
        F.lit(f"[{lo}, {hi}]").alias("expected"),
        F.col("part"))
