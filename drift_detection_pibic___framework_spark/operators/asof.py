"""Distributed as-of join (latest right row at-or-before each left row).

The reference's drift monitors always compare an incoming sample against
the most recent fitted baseline (the detector re-baselines after every
confirmed drift — /root/reference/frameworkDetector/framework_detector.py:
the post-drift retrain replaces the model the NEXT samples are scored
against).  At table scale that per-sample "latest baseline" lookup is an
as-of join: event row -> most recent checkpoint row with
``checkpoint.ts <= event.ts`` within the same key.

Spark has no ASOF JOIN operator (DuckDB/QuestDB do), and the naive
formulation is a non-equi range join that Catalyst can only execute as a
broadcast-nested-loop.  The scale-safe distributed form used here is the
classic union-tag + keyed running ``last(ignoreNulls)``:

1. union the tagged right rows (tag 0) with the left rows (tag 1) on a
   common ordering column;
2. ONE hash-partition shuffle on the join keys; within each key the
   window ``orderBy(ts, tag) rowsBetween(unboundedPreceding, current)``
   makes ``last(value, ignoreNulls=True)`` carry the latest right-row
   payload forward onto every subsequent left row;
3. filter back to the left rows.

Cost: one shuffle of |left| + |right| rows, O(1) state per row — the same
shape as sessionization, so it survives 10^12 rows as long as the key
space distributes (hot keys are a window-skew hazard exactly as in any
keyed window; salt the key upstream if one key dominates).

Tie semantics are inclusive (right row AT the left timestamp wins —
tag 0 sorts before tag 1), matching DuckDB's ``ASOF JOIN ON l.ts >= r.ts``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str, values: Sequence[str],
              how: str = "left") -> DataFrame:
    """Join each left row to the latest right row with
    ``right[right_ts] <= left[left_ts]``, matching on the ``on`` keys.

    Returns all left columns plus ``values`` and ``right_ts`` (the matched
    checkpoint's own timestamp) from the matched right row; unmatched left
    rows keep nulls (``how='left'``) or are dropped (``how='inner'``).

    Requirements:
    - ``right`` must be unique per (``on``, ``right_ts``) — with duplicate
      right timestamps inside one key, which duplicate wins is undefined
      (same as DuckDB ASOF).
    - ``right_ts`` and ``values`` must not collide with left column names.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    on = list(on)
    values = list(values)
    carry = values + [right_ts]          # right payload carried onto left rows
    left_only = [c for c in left.columns if c not in on]
    clash = set(carry) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")

    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_asof_t"),
        F.lit(1).alias("_asof_tag"),
        *[F.col(c) for c in left_only],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in carry])
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_asof_t"),
        F.lit(0).alias("_asof_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_only],
        *[F.col(c) for c in values],
        F.col(right_ts))

    w = (Window.partitionBy(*on).orderBy("_asof_t", "_asof_tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = l_tagged.unionByName(r_tagged)
    for c in carry:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.filter(F.col("_asof_tag") == 1).drop("_asof_t", "_asof_tag")
    if how == "inner":
        out = out.filter(F.col(right_ts).isNotNull())
    return out
