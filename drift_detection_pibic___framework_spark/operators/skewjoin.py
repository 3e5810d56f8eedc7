"""Skew-salted equi-join: hot fact keys fanned out over n_salts reducers.

north_rule: "partitioning / shuffle / skew handled explicitly".  The clips
table's codec key is deliberately hot (80/15/5 — FIXTURES.md §1), the same
shape as the reference's per-regime pool dispatch
(/root/reference/utils/StreamProcessor.py:227) where one regime dominates
the stream.  A plain shuffle join on such a key sends ~80% of the fact
table to ONE reducer; the standard treatments, in preference order:

1. ``F.broadcast(dim)`` — if the dim fits in memory there is NO fact
   shuffle at all.  ``referential.py`` uses this; it is the right answer
   for the 3-row codec dimension and the default everyone should reach
   for first.
2. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``) — splits
   oversized sort-merge partitions at runtime; free, but only kicks in
   for sort-merge joins past the size thresholds.
3. **Salting (this module)** — deterministic fan-out for the mid-size
   dim: too big to broadcast, fact keys too skewed for one reducer.
   Fact rows get ``salt = xxhash64(row-id) % n_salts``; the dim is
   replicated ``n_salts``× via ``explode(sequence(...))``; the join key
   becomes ``(key, salt)`` so the hot key's rows spread across
   ``n_salts`` reducers instead of one.  Cost: dim shuffled/built
   n_salts× larger — which is exactly why broadcast wins when it fits.

The join OUTPUT is identical to the unsalted join (salt is an internal
column, dropped on return), so any query built on it oracles against the
plain SQL join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

SALT = "_skew_salt"


def salted_join(fact: DataFrame, dim: DataFrame, on: str | Sequence[str],
                salt_from: str | Sequence[str], n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join ``fact`` to ``dim`` on ``on`` with the fact side salted.

    ``salt_from`` names fact column(s) whose xxhash64 derives the salt —
    use a high-cardinality row id so the hot key spreads evenly; the
    derivation is deterministic (task retries re-salt identically, unlike
    ``F.rand``).  ``dim`` must be the SMALL side (it is replicated
    ``n_salts``×) and must carry each ``on`` key at most once per join
    semantics you expect — replication preserves multiplicity.  The
    shuffle_hash hint pins the salted path to a shuffled hash join so the
    fan-out actually lands on (key, salt) reducers instead of being
    re-collapsed by a broadcast of the replicated dim (which would make
    the salt pointless — if the dim broadcasts, call ``F.broadcast``
    directly and skip salting).
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    salt_cols = ([salt_from] if isinstance(salt_from, str)
                 else list(salt_from))
    f = fact.withColumn(
        SALT, F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int"))
    d = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return f.join(d.hint("shuffle_hash"), keys + [SALT], how).drop(SALT)
