"""Column profiling + automatic constraint suggestion (Deequ-style).

The validation suite (plans/suite.py) runs HAND-WRITTEN checks; this module
closes the loop that production validation engines ship as a headline
feature (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018 — Deequ's ConstraintSuggestionRunner; Great
Expectations' profilers): PROFILE a trusted baseline table once, derive the
constraints its data actually satisfies, and run those as the per-partition
check suite against every new ingest.  The reference framework has no
analogue (it monitors model error streams, not table constraints); this is
the pipeline extension the build brief requires, expressed Spark-first.

Scale design (10^12 rows):
- ``column_profiles`` is ONE aggregation pass over the table: every
  per-column statistic (count/nulls/distinct/min/max/mean/stddev/lengths)
  for every profiled column is computed in a single ``df.agg(...)`` with
  map-side partial aggregation — the shuffle carries one partial row per
  input split, never raw rows.  The ``bytes`` payload column is excluded by
  default, so the Parquet scan prunes it (ReadSchema-verified pattern,
  operators/stats.py).
- distinct counts default to ``approx_count_distinct`` (HLL++, mergeable,
  one pass).  ``exact_distinct=True`` switches to exact ``count_distinct``
  for oracle parity at test scale — Spark plans that via EXPAND (one pass,
  n_cols× map-side rows), which is the documented cost of exactness.
- ``suggest_constraints`` applies the rule set DRIVER-SIDE over the
  collected profile (O(n_columns) rows — the same architecture as Deequ,
  whose suggestion rules run on the driver over collected metrics).  The
  only extra cluster work is ONE restricted second pass collecting the
  value domain of columns the profile already proved low-cardinality —
  ``collect_set`` is never evaluated on a column that could be large.
- ``suggested_suite_verdicts`` compiles the suggestions back into ONE
  aggregation pass emitting the standard per-partition verdict rows
  (part, check_name, passed, observed, expected) — the whole suggested
  suite costs a single shuffle, like plans/suite.py's shared-stats design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_SKIP = (T.BinaryType, T.ArrayType, T.MapType, T.StructType)

PROFILE_SCHEMA = T.StructType([
    T.StructField("column", T.StringType(), False),
    T.StructField("dtype", T.StringType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("n_nonnull", T.LongType(), False),
    T.StructField("completeness", T.DoubleType(), True),
    T.StructField("n_distinct", T.LongType(), True),
    T.StructField("min_num", T.DoubleType(), True),
    T.StructField("max_num", T.DoubleType(), True),
    T.StructField("mean", T.DoubleType(), True),
    T.StructField("stddev", T.DoubleType(), True),
    T.StructField("min_len", T.IntegerType(), True),
    T.StructField("max_len", T.IntegerType(), True),
])

SUGGESTION_SCHEMA = T.StructType([
    T.StructField("column", T.StringType(), False),
    T.StructField("constraint", T.StringType(), False),
    T.StructField("params", T.StringType(), False),
])


def profilable_columns(df: DataFrame) -> list:
    """Scalar (non-binary, non-complex) columns — the default profile set.
    Excluding binary means the audio ``bytes`` payload never reaches the
    scan (column pruning)."""
    return [f.name for f in df.schema.fields
            if not isinstance(f.dataType, _SKIP)]


def _dtype_tag(dt: T.DataType) -> str:
    if isinstance(dt, _NUMERIC):
        return "numeric"
    if isinstance(dt, T.StringType):
        return "string"
    return "other"          # bool/date/timestamp: counts + distinct only


def column_profiles(df: DataFrame, cols: list = None,
                    exact_distinct: bool = False,
                    round_to: int = 6) -> DataFrame:
    """Long-format per-column profile: one output row per profiled column,
    all columns computed in ONE aggregation pass (see module docstring).

    Numeric columns fill min_num/max_num/mean/stddev (min_len/max_len
    NULL); string columns fill min_len/max_len of the string length
    (numeric stats NULL).  ``completeness`` = n_nonnull / n_rows, rounded.
    """
    cols = list(cols) if cols is not None else profilable_columns(df)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        tag = _dtype_tag(by_name[c])
        nd = (F.count_distinct(F.col(c)) if exact_distinct
              else F.approx_count_distinct(c))
        aggs += [F.count(c).alias(f"_nn_{c}"), nd.alias(f"_nd_{c}")]
        if tag == "numeric":
            aggs += [
                F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
                F.round(F.avg(F.col(c).cast("double")), round_to)
                .alias(f"_mean_{c}"),
                F.round(F.stddev_samp(F.col(c).cast("double")), round_to)
                .alias(f"_std_{c}"),
            ]
        elif tag == "string":
            aggs += [
                F.min(F.length(c)).alias(f"_minl_{c}"),
                F.max(F.length(c)).alias(f"_maxl_{c}"),
            ]
    row = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_i = F.lit(None).cast("int")
    structs = []
    for c in cols:
        tag = _dtype_tag(by_name[c])
        num = tag == "numeric"
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.lit(tag).alias("dtype"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_nonnull"),
            F.round(F.col(f"_nn_{c}") / F.col("_n"), round_to)
            .alias("completeness"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (F.col(f"_min_{c}") if num else null_d).alias("min_num"),
            (F.col(f"_max_{c}") if num else null_d).alias("max_num"),
            (F.col(f"_mean_{c}") if num else null_d).alias("mean"),
            (F.col(f"_std_{c}") if num else null_d).alias("stddev"),
            (F.col(f"_minl_{c}").cast("int") if tag == "string"
             else null_i).alias("min_len"),
            (F.col(f"_maxl_{c}").cast("int") if tag == "string"
             else null_i).alias("max_len"),
        ))
    return (row.select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*"))


# -------------------------------------------------------------------------
# suggestion rules
# -------------------------------------------------------------------------
# Deterministic, engine-portable formatting: params never contain a bare
# float (float-to-string differs between engines) — ranges use the raw
# numeric rendering only when the column is integral, completeness
# thresholds are integer percents, domains are comma-joined sorted values.

def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else str(round(v, 6))


def _range_bounds(lo: float, hi: float):
    """Range params rounded OUTWARD at 6 dp — rounding a bound inward
    would exclude observed values, so a table could fail its own suggested
    range (the self-consistency invariant tests/test_properties pins).
    Returns None for non-finite bounds (NaN min/max: no sane range)."""
    import math
    if not (math.isfinite(lo) and math.isfinite(hi)):
        return None
    # the *1e6 scaling is only exact while v*1e6 stays below 2^53 — past
    # that, floor(v*1e6)/1e6 can land ABOVE v (inward!), breaking the
    # self-consistency invariant for huge magnitudes (hypothesis found
    # 6_499_472_767_520_849).  Large doubles are >= integer-spaced, so
    # plain floor/ceil is exact and outward there.
    LIM = 8.0e9      # 8e9 * 1e6 = 8e15 < 2^53
    flo = (math.floor(lo * 1e6) / 1e6 if abs(lo) < LIM
           else float(math.floor(lo)))
    fhi = (math.ceil(hi * 1e6) / 1e6 if abs(hi) < LIM
           else float(math.ceil(hi)))
    if not (math.isfinite(flo) and math.isfinite(fhi)):
        return lo, hi
    return flo, fhi


def _rules(r, domain: list = None, unique_ok: bool = None) -> list:
    """The suggestion rule set applied to one profile row ``r``.
    Returns (constraint, params) tuples.

    - complete column            -> ``not_null``
    - mostly-complete column     -> ``completeness_pct_ge`` at the observed
      completeness floored to an integer percent (slack against sampling
      noise, Deequ's RetainCompletenessRule)
    - complete + all-distinct    -> ``unique`` (``unique_ok`` overrides the
      profile's distinct count when the caller verified exactly)
    - numeric column             -> ``range`` [observed min, observed max]
    - low-cardinality column     -> ``isin`` over the observed domain
    """
    out = []
    if r.n_rows and r.n_nonnull == r.n_rows:
        out.append(("not_null", ""))
        if (unique_ok if unique_ok is not None
                else r.n_distinct == r.n_rows):
            out.append(("unique", ""))
    elif r.n_nonnull and r.n_nonnull < r.n_rows:
        pct = int((r.n_nonnull * 100) // r.n_rows)
        if pct > 0:
            out.append(("completeness_pct_ge", str(pct)))
    if r.dtype == "numeric" and r.min_num is not None:
        b = _range_bounds(r.min_num, r.max_num)
        if b is not None:
            out.append(("range", f"[{_fmt_num(b[0])},{_fmt_num(b[1])}]"))
    # isin: only a non-empty domain, and only when the comma-joined params
    # encoding round-trips (a value containing ',' — or the empty string,
    # which joins invisibly — could not survive a saved contract; fail
    # safe by not suggesting)
    if domain and not any("," in v or v == "" for v in domain):
        out.append(("isin", ",".join(domain)))
    return out


def suggest_constraints(df: DataFrame, cols: list = None,
                        max_domain: int = 10,
                        exact_distinct: bool = False) -> DataFrame:
    """Profile ``df`` and return suggested constraints as
    (column, constraint, params) rows — Deequ's ConstraintSuggestionRunner
    re-expressed over the one-pass profile.

    Cluster work: the profile pass, plus ONE second pass restricted to the
    columns the profile proved low-cardinality (n_distinct <= max_domain)
    collecting their sorted value domains.  Rule application itself is
    O(n_columns) driver-side metadata work (same as Deequ).  With the
    default ``exact_distinct=False`` the cardinality screen uses HLL++;
    a column whose approximate count sits within error of ``max_domain``
    still yields an exact (collected) domain, so the emitted ``isin`` list
    is always the true observed domain."""
    prof = column_profiles(df, cols, exact_distinct=exact_distinct)
    rows = prof.collect()            # O(n_columns) — bounded by contract
    low = [r.column for r in rows
           if r.n_distinct is not None and r.n_distinct <= max_domain]
    # unique rule under APPROX counts: HLL can under/over-shoot, so a
    # `approx == n_rows` test both misses real keys and blesses near-keys.
    # Screen candidates at 90% of n_rows (beyond HLL++ default error),
    # then verify EXACTLY — at scale that is one count_distinct per
    # candidate key column, not per column.
    cand = []
    if not exact_distinct:
        cand = [r.column for r in rows
                if r.n_rows and r.n_nonnull == r.n_rows
                and r.n_distinct is not None
                and r.n_distinct >= 0.9 * r.n_rows]
    # the domain collection and the exact-unique verification are
    # independent restricted aggregations over the same table: run them
    # as ONE aggregation pass (one scan, one job) instead of two
    # (optimization round, guide §1.2 — don't pay two full passes where
    # one computes both)
    domains, unique_ok = {}, {}
    if low or cand:
        aggs = [F.sort_array(F.collect_set(F.col(c).cast("string")))
                .alias(f"_dom_{c}") for c in low]
        aggs += [F.count_distinct(F.col(c)).alias(f"_uniq_{c}")
                 for c in cand]
        row2 = df.agg(*aggs).collect()[0]
        domains = {c: list(row2[f"_dom_{c}"]) for c in low}
        n = rows[0].n_rows
        unique_ok = {c: row2[f"_uniq_{c}"] == n for c in cand}
    data = []
    for r in rows:
        for constraint, params in _rules(r, domains.get(r.column),
                                         unique_ok.get(r.column)):
            data.append((r.column, constraint, params))
    spark = df.sparkSession
    return spark.createDataFrame(data, SUGGESTION_SCHEMA)


# -------------------------------------------------------------------------
# zero-scan suggestion from TableIO commit sidecars
# -------------------------------------------------------------------------

def suggest_from_sidecars(spark, io, name: str, max_domain: int = 10,
                          hll_rse: float = 0.016) -> DataFrame:
    """Constraint suggestion over a TableIO table WITHOUT scanning it:
    fold the per-commit stats sidecars (``append(..., stats_cols/
    cat_cols/key_cols)``) that snapshot_diff's drift gates already
    maintain.  At 100 TB this is the difference between an O(table)
    profiling job and O(commits) JSON reads plus one tiny sketch-merge
    job — the same zero-rescan trade the commit gates make.

    Per sidecar family:
    - moment sidecars (numeric ``stats_cols``) -> not_null /
      completeness floor / range, exactly as the scan path (sums, nulls
      and min/max are exact and mergeable);
    - Misra-Gries sidecars (``cat_cols``) -> not_null / completeness
      from the sketch's exact item count; ``isin`` ONLY when the merged
      sketch's error bound is zero (no counter evictions ever happened),
      which proves the counter set IS the complete observed domain;
    - HLL sidecars (``key_cols``) -> ``unique`` when the union estimate
      covers the row count within 3x the sketch's relative std error
      (lgK=12 -> ~1.6%); params are set to ``approx`` because HLL noise
      cannot rule out a sub-percent duplicate rate — run the scan-path
      ``suggest_constraints`` when exact key verification matters.

    A column missing from ANY profiled commit is skipped (its values in
    those commits are unknown — fail safe).  Constraints for a column
    appearing in several families are deduplicated.
    """
    import base64

    from ..functions.sketches import MisraGries

    sidecars = io.snapshot_stats(name)
    if not sidecars:
        raise ValueError(f"table {name} has no stats sidecars")
    rows_total = sum(sc["rows"] for sc in sidecars)
    out, seen = [], set()

    def emit(col, constraint, params):
        if (col, constraint) not in seen:
            seen.add((col, constraint))
            out.append((col, constraint, params))

    def completeness_rules(col, n_nonnull):
        if rows_total and n_nonnull == rows_total:
            emit(col, "not_null", "")
        elif n_nonnull and n_nonnull < rows_total:
            pct = int((n_nonnull * 100) // rows_total)
            if pct > 0:
                emit(col, "completeness_pct_ge", str(pct))

    num_cols = set(sidecars[0].get("cols", ()))
    for sc in sidecars[1:]:
        num_cols &= set(sc.get("cols", ()))
    for c in sorted(num_cols):
        n = nulls = 0
        mn = mx = None
        for sc in sidecars:
            cc = sc["cols"][c]
            n += cc["n"]
            nulls += cc["nulls"]
            if cc["n"]:
                mn = cc["min"] if mn is None else min(mn, cc["min"])
                mx = cc["max"] if mx is None else max(mx, cc["max"])
        completeness_rules(c, n)
        if mn is not None:
            b = _range_bounds(float(mn), float(mx))
            if b is not None:
                emit(c, "range", f"[{_fmt_num(b[0])},{_fmt_num(b[1])}]")

    mg_cols = set(sidecars[0].get("mg", ()))
    for sc in sidecars[1:]:
        mg_cols &= set(sc.get("mg", ()))
    for c in sorted(mg_cols):
        merged = None
        for sc in sidecars:
            sk = MisraGries.deserialize(base64.b64decode(sc["mg"][c]))
            merged = sk if merged is None else merged.merge(sk)
        completeness_rules(c, merged.n)
        if merged.err == 0 and 0 < len(merged.counters) <= max_domain:
            domain = sorted(str(v) for v in merged.counters)
            if not any("," in v or v == "" for v in domain):
                emit(c, "isin", ",".join(domain))

    hll_cols = set(sidecars[0].get("hll", ()))
    for sc in sidecars[1:]:
        hll_cols &= set(sc.get("hll", ()))
    for c in sorted(hll_cols):
        n = sum(sc["hll"][c]["n"] for sc in sidecars)
        completeness_rules(c, n)
        if n == rows_total and rows_total:
            sk_rows = [(base64.b64decode(sc["hll"][c]["sketch"]),)
                       for sc in sidecars]
            est = (spark.createDataFrame(sk_rows, "sketch binary")
                   .agg(F.expr(
                       "hll_sketch_estimate(hll_union_agg(sketch, true))"))
                   .collect()[0][0])
            if est is not None and \
                    float(est) >= (1.0 - 3.0 * hll_rse) * rows_total:
                emit(c, "unique", "approx")
    return spark.createDataFrame(out, SUGGESTION_SCHEMA)


def sidecar_contract_drift(spark, io, name: str, pinned,
                           max_domain: int = 10) -> list:
    """Constraint-level drift gate at COMMIT granularity with zero table
    scan: re-suggest from the table's commit sidecars
    (``suggest_from_sidecars``) and diff against the pinned contract
    (``diff_contracts``).  Run it after every ``append`` beside the
    snapshot_diff gates — a loosened constraint (drift=True row) means
    the ingested history no longer supports what the pin promises, at
    O(commits) JSON reads + one sketch-merge job regardless of table
    size.  Returns diff_contracts' row dicts.

    The pin may come from the SCAN path (``--suggest``), which observes
    constraint families the sidecars cannot (isin needs a Misra-Gries
    sidecar, unique an HLL one, everything needs the column profiled at
    all).  A pinned constraint whose family is UNOBSERVABLE from the
    committed sidecars is skipped rather than reported "removed" —
    absence of evidence, not drift.  "added" rows are dropped too (the
    pin's silence on a constraint is a decision, not a gap)."""
    sidecars = io.snapshot_stats(name)
    observed = suggest_from_sidecars(spark, io, name,
                                     max_domain=max_domain)

    def family_sets(key):
        out = set()
        for sc in sidecars:
            out |= {(c, key) for c in sc.get(key, ())}
        return out

    num = {c for c, _ in family_sets("cols")}
    mg = {c for c, _ in family_sets("mg")}
    hll = {c for c, _ in family_sets("hll")}
    completeness_ok = num | mg | hll

    def observable(col, constraint):
        if constraint in ("not_null", "completeness_pct_ge"):
            return col in completeness_ok
        if constraint == "range":
            return col in num
        if constraint == "isin":
            return col in mg
        if constraint == "unique":
            return col in hll
        return False

    if isinstance(pinned, DataFrame):
        pinned = pinned.collect()
    pinned = [(r["column"], r["constraint"], r["params"])
              if isinstance(r, dict) else (r[0], r[1], r[2])
              for r in pinned]
    pinned = [p for p in pinned if observable(p[0], p[1])]
    return [d for d in diff_contracts(pinned, observed)
            if d["change"] != "added"]


# -------------------------------------------------------------------------
# contract diffing: constraint-level drift detection
# -------------------------------------------------------------------------

def diff_contracts(pinned, observed) -> list:
    """Diff a PINNED contract against the constraints OBSERVED on current
    data (a fresh ``suggest_constraints`` run) — drift detection at the
    constraint level: the moment data stops supporting a pinned
    constraint, the re-suggestion loosens or drops it, and that is the
    drift signal (the semantic complement of the distribution gates in
    drift_dist/snapshot_diff).

    Classification (``drift=True`` marks a LOOSENING — current data no
    longer satisfies what the pin promises):
    - pinned constraint absent from observed        -> removed, drift
    - range widened / isin gained values /
      completeness floor lowered                    -> drift
    - range narrowed / isin lost values /
      completeness floor raised                     -> tightened, no drift
      (current data satisfies the pin with room to spare)
    - constraint observed but not pinned            -> added, no drift
      (candidate to adopt)

    Pure metadata work over two tiny row lists (driver-side, like rule
    application itself); inputs are DataFrames, (column, constraint,
    params) tuples, or dicts as saved in the contract JSON.  Returns a
    list of dicts (column, constraint, change, before, after, drift).
    """
    def norm(rows):
        if isinstance(rows, DataFrame):
            rows = rows.collect()
        out = {}
        for r in rows:
            if isinstance(r, dict):
                out[(r["column"], r["constraint"])] = r["params"]
            else:
                out[(r[0], r[1])] = r[2]
        return out

    def parse_range(params):
        lo, hi = params.strip("[]").split(",")
        return float(lo), float(hi)

    old, new = norm(pinned), norm(observed)
    diffs = []

    def add(key, change, before, after, drift):
        diffs.append({"column": key[0], "constraint": key[1],
                      "change": change, "before": before, "after": after,
                      "drift": drift})

    for key in sorted(old):
        bef = old[key]
        if key not in new:
            add(key, "removed", bef, None, True)
            continue
        aft = new[key]
        if bef == aft:
            continue
        col, constraint = key
        if constraint == "range":
            (blo, bhi), (alo, ahi) = parse_range(bef), parse_range(aft)
            loosened = alo < blo or ahi > bhi
            add(key, "widened" if loosened else "narrowed", bef, aft,
                loosened)
        elif constraint == "isin":
            b = set(bef.split(",")) if bef else set()
            a = set(aft.split(",")) if aft else set()
            loosened = bool(a - b)
            add(key, "domain_grew" if loosened else "domain_shrank",
                bef, aft, loosened)
        elif constraint == "completeness_pct_ge":
            loosened = int(aft) < int(bef)
            add(key, "floor_lowered" if loosened else "floor_raised",
                bef, aft, loosened)
        else:                    # not_null/unique param cosmetics
            add(key, "params_changed", bef, aft, False)
    for key in sorted(set(new) - set(old)):
        add(key, "added", None, new[key], False)
    return diffs


# -------------------------------------------------------------------------
# compiling suggestions back into an executable per-partition suite
# -------------------------------------------------------------------------

KNOWN_CONSTRAINTS = ("not_null", "unique", "completeness_pct_ge",
                     "range", "isin")


def load_contract(path: str) -> list:
    """Load + validate a contract JSON file (the --suggest --contract
    artifact): a list of {column, constraint, params} dicts with a known
    constraint name and a parseable params format.  Raises ValueError
    with the offending entry spelled out — a malformed contract must fail
    HERE, not as an opaque analysis error deep inside the compiled
    suite."""
    import json

    with open(path) as f:
        data = json.load(f)
    if not isinstance(data, list):
        raise ValueError(f"contract {path}: expected a JSON list, "
                         f"got {type(data).__name__}")
    out = []
    for i, r in enumerate(data):
        if not isinstance(r, dict) or not {"column", "constraint",
                                           "params"} <= set(r):
            raise ValueError(
                f"contract {path}[{i}]: each entry needs column/"
                f"constraint/params, got {r!r}")
        col, constraint, params = r["column"], r["constraint"], r["params"]
        if constraint not in KNOWN_CONSTRAINTS:
            raise ValueError(
                f"contract {path}[{i}]: unknown constraint "
                f"{constraint!r} (known: {', '.join(KNOWN_CONSTRAINTS)})")
        if constraint == "range":
            try:
                lo, hi = (float(x) for x in params.strip("[]").split(","))
            except (ValueError, TypeError):
                raise ValueError(
                    f"contract {path}[{i}]: range params must be "
                    f"'[lo,hi]', got {params!r}") from None
            if lo > hi:
                raise ValueError(
                    f"contract {path}[{i}]: empty range {params!r}")
        elif constraint == "completeness_pct_ge":
            if not (isinstance(params, str) and params.isdigit()
                    and 0 < int(params) <= 100):
                raise ValueError(
                    f"contract {path}[{i}]: completeness_pct_ge params "
                    f"must be an integer percent in (0, 100], "
                    f"got {params!r}")
        out.append((col, constraint, params))
    return out


def _norm_rows(suggestions) -> list:
    """Accept a suggestions DataFrame, (column, constraint, params)
    tuples/Rows, or contract-JSON dicts — every compile surface takes any
    of the three."""
    if isinstance(suggestions, DataFrame):
        suggestions = suggestions.collect()
    return [(r["column"], r["constraint"], r["params"])
            if isinstance(r, dict) else (r[0], r[1], r[2])
            for r in suggestions]


def suggested_suite_verdicts(df: DataFrame, suggestions,
                             part_col: str = "part") -> DataFrame:
    """Run a suggestion set as per-partition checks: ONE aggregation pass
    computes every suggested constraint's per-partition pass/fail, emitted
    in the standard verdict schema (part, check_name, passed, observed,
    expected) that plans/runner.py persists.

    ``suggestions`` is the DataFrame from ``suggest_constraints`` or an
    equivalent list of (column, constraint, params) rows; it is collected
    (bounded: a handful of rows per column) and compiled into column
    expressions — the suite itself never leaves the JVM.
    """
    suggestions = _norm_rows(suggestions)
    if not suggestions:         # empty contract: no checks, no rows
        return (df.select(F.col(part_col)).limit(0)
                .select(part_col,
                        F.lit("").alias("check_name"),
                        F.lit(True).alias("passed"),
                        F.lit("").alias("observed"),
                        F.lit("").alias("expected")))
    aggs, verdicts = [], []

    def emit(name, passed, observed, expected):
        verdicts.append(F.struct(
            F.lit(name).alias("check_name"),
            passed.alias("passed"),
            observed.cast("string").alias("observed"),
            F.lit(expected).alias("expected")))

    for i, s in enumerate(suggestions):
        col, constraint, params = s[0], s[1], s[2]
        if constraint == "not_null":
            a = F.sum(F.col(col).isNull().cast("long")).alias(f"_a{i}")
            aggs.append(a)
            emit(f"not_null({col})", F.col(f"_a{i}") == 0,
                 F.col(f"_a{i}"), "0 nulls")
        elif constraint == "completeness_pct_ge":
            pct = int(params)
            a = F.round(F.avg(F.col(col).isNotNull().cast("double")) * 100,
                        6).alias(f"_a{i}")
            aggs.append(a)
            emit(f"completeness({col})", F.col(f"_a{i}") >= pct,
                 F.col(f"_a{i}"), f">= {pct}%")
        elif constraint == "unique":
            aggs += [F.count_distinct(F.col(col)).alias(f"_a{i}"),
                     F.count(F.col(col)).alias(f"_b{i}")]
            emit(f"unique({col})", F.col(f"_a{i}") == F.col(f"_b{i}"),
                 F.concat_ws("/", F.col(f"_a{i}"), F.col(f"_b{i}")),
                 "distinct = rows")
        elif constraint == "range":
            lo, hi = params.strip("[]").split(",")
            lo, hi = float(lo), float(hi)
            aggs += [F.min(F.col(col).cast("double")).alias(f"_a{i}"),
                     F.max(F.col(col).cast("double")).alias(f"_b{i}")]
            emit(f"range({col})",
                 (F.col(f"_a{i}") >= lo) & (F.col(f"_b{i}") <= hi),
                 F.concat_ws("..", F.col(f"_a{i}"), F.col(f"_b{i}")),
                 f"[{_fmt_num(lo)}, {_fmt_num(hi)}]")
        elif constraint == "isin":
            domain = params.split(",") if params else []
            bad = (F.col(col).isNotNull()
                   & ~F.col(col).cast("string").isin(domain))
            aggs.append(F.sum(bad.cast("long")).alias(f"_a{i}"))
            emit(f"isin({col})", F.col(f"_a{i}") == 0,
                 F.col(f"_a{i}"), f"all in {{{params}}}")
        else:
            raise ValueError(f"unknown suggested constraint: {constraint}")

    agged = df.groupBy(part_col).agg(*aggs)
    return (agged.select(F.col(part_col),
                         F.explode(F.array(*verdicts)).alias("v"))
            .select(part_col, "v.check_name", "v.passed", "v.observed",
                    "v.expected"))


def suggested_suite_violations(df: DataFrame, suggestions,
                               id_col: str = "clip_id",
                               part_col: str = "part") -> DataFrame:
    """Row-level violation rows (id, check_name, observed, expected, part)
    for the ROW-EXPRESSIBLE constraints of a contract — the north-rule
    violation contract applied to the suggested/contract suite.

    not_null / range / isin test each row independently, so every
    violation is found in ONE narrow projection: an array of violation
    structs per row, exploded — zero shuffle, whole-stage codegen, and at
    10^12 rows the scan reads only the constrained columns plus id/part.
    unique and completeness_pct_ge are PARTITION-scope constraints (a row
    alone cannot breach them) and emit no rows here — their granularity is
    ``suggested_suite_verdicts``, exactly like dist_drift in the
    hand-written suite (plans/suite.py)."""
    suggestions = _norm_rows(suggestions)
    null_s = F.lit(None).cast("string")

    def viol(name, bad, observed, expected):
        return F.when(bad, F.struct(
            F.lit(name).alias("check_name"),
            observed.cast("string").alias("observed"),
            F.lit(expected).alias("expected"))).otherwise(
                F.lit(None).cast(
                    "struct<check_name:string,observed:string,"
                    "expected:string>"))

    structs = []
    for s in suggestions:
        col, constraint, params = s[0], s[1], s[2]
        if constraint == "not_null":
            structs.append(viol(f"not_null({col})", F.col(col).isNull(),
                                F.lit("NULL"), f"non-null {col}"))
        elif constraint == "range":
            lo, hi = (float(x) for x in params.strip("[]").split(","))
            v = F.col(col).cast("double")
            structs.append(viol(f"range({col})",
                                v.isNotNull() & ((v < lo) | (v > hi)),
                                F.col(col),
                                f"[{_fmt_num(lo)}, {_fmt_num(hi)}]"))
        elif constraint == "isin":
            domain = params.split(",") if params else []
            structs.append(viol(
                f"isin({col})",
                F.col(col).isNotNull()
                & ~F.col(col).cast("string").isin(domain),
                F.col(col), f"in {{{params}}}"))
        elif constraint in ("unique", "completeness_pct_ge"):
            continue            # partition-scope: verdicts only
        else:
            raise ValueError(f"unknown suggested constraint: {constraint}")
    if not structs:
        return (df.select(F.col(id_col), F.col(part_col)).limit(0)
                .select(id_col, F.lit("").alias("check_name"),
                        null_s.alias("observed"), null_s.alias("expected"),
                        part_col))
    return (df.select(
        F.col(id_col), F.col(part_col),
        F.explode(F.filter(F.array(*structs),
                           lambda v: v.isNotNull())).alias("v"))
        .select(id_col, "v.check_name", "v.observed", "v.expected",
                part_col))
