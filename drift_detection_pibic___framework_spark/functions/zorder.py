"""Z-order (Morton) clustering expressions — multi-dimensional data layout
so file-level min/max pruning stays selective on EVERY clustered column.

A table range-clustered on one column prunes beautifully on that column and
not at all on any other.  Interleaving the bits of per-column bucket codes
(the Morton curve) gives every clustered column locality at once: a file
holding a contiguous z-value range covers a small hyper-rectangle of the
original space, so its footer min/max is tight on ALL the clustered columns
— the same layout optimization Iceberg/Delta expose as ``ZORDER BY``.

Everything here is a pure Catalyst expression tree (casts, arithmetic,
shifts, bitwise AND) — whole-stage-codegen'd, no UDF, no extra pass over
the data beyond the one cheap global min/max aggregate the caller supplies.

Reference provenance: the reference framework has no storage layout layer
(it streams in-memory lists, /root/reference/fluxo/StreamProcessor.py); this
module exists for the 100-TB north_rule — at 10^12 clips, reads that cannot
skip files do not finish.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bucket_code", "zvalue", "cluster_bounds"]


def bucket_code(col: str, lo: float, hi: float, bits: int) -> Column:
    """Equi-width bucket code of ``col`` in ``[0, 2**bits)`` given the
    column's global ``[lo, hi]`` bounds.  Nulls and out-of-range values
    clamp to the edge buckets (they must land SOMEWHERE deterministic so
    the write is reproducible; pruning correctness never depends on the
    code — residual filters always re-apply the predicate)."""
    n_buckets = 1 << bits
    span = float(hi) - float(lo)
    if span <= 0:  # constant column: everything in bucket 0
        return F.lit(0).cast("bigint")
    raw = F.floor(
        (F.col(col).cast("double") - F.lit(float(lo)))
        * F.lit(n_buckets / span))
    return F.coalesce(
        F.least(F.lit(n_buckets - 1).cast("bigint"),
                F.greatest(F.lit(0).cast("bigint"), raw.cast("bigint"))),
        F.lit(0).cast("bigint"))


def zvalue(cols: list, bounds: dict, bits: int = 8) -> Column:
    """Morton z-value column interleaving ``bits`` bits of each column's
    bucket code.  ``bounds`` maps column name -> (lo, hi) global bounds.
    With ``n = len(cols)`` columns the result uses ``bits * n`` bits —
    keep ``bits * n <= 62`` (bigint).  Bit ``b`` of column ``j`` lands at
    output position ``b * n + j``, the standard interleave."""
    n = len(cols)
    if n == 0:
        raise ValueError("zvalue needs at least one column")
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols overflows bigint")
    if n == 1:  # degenerate: z-order of one column IS its bucket code
        lo, hi = bounds[cols[0]]
        return bucket_code(cols[0], lo, hi, bits)
    codes = [bucket_code(c, *bounds[c], bits=bits) for c in cols]
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, code in enumerate(codes):
            bit = F.shiftright(code, b).bitwiseAND(F.lit(1).cast("bigint"))
            z = z + F.shiftleft(bit, b * n + j)
    return z


def cluster_bounds(df: DataFrame, cols: list) -> dict:
    """Global (min, max) per column in ONE aggregate pass — the only data
    scan z-ordering adds, and it is a footer-only scan when the columns
    are already profiled (parquet readers answer bare min/max from
    statistics).  Columns that are entirely null get (0, 0): every row
    clamps to bucket 0, which is still a valid (if useless) layout."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"_lo_{c}"] if row[f"_lo_{c}"] is not None else 0.0,
                row[f"_hi_{c}"] if row[f"_hi_{c}"] is not None else 0.0)
            for c in cols}
