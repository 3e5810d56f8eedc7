"""Deterministic sampling operators for training-data curation.

A 100 TB corpus is never trained on whole: pipelines carve deterministic,
reproducible subsets (ablation slices, per-source quotas, eval holdouts).
Random `sample()` is neither reproducible across runs/engines nor stable
under re-partitioning, so both operators here key off a content hash:

- ``hash_sample``: keep rows whose md5(key) falls below a threshold —
  a pure narrow FILTER (no shuffle, pushes past column pruning, scales
  embarrassingly). The md5-prefix trick is ANSI-SQL-expressible, so the
  DuckDB oracle computes the identical sample.
- ``group_cap``: at most ``cap`` rows per group, deterministic rank order —
  one hash-partitioned window shuffle on the group key. This is the
  per-domain/per-source quota every web-scale curation run applies
  (e.g. cap docs per domain so one crawler trap can't dominate the mix).

(Reference has no analogue — the reference never samples; this module is
part of the training-data-pipeline extension required by the build brief.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hash_sample(df: DataFrame, key_col: str, threshold_256: int) -> DataFrame:
    """Deterministic ~(threshold_256/256) sample: keep rows where the first
    md5 byte of the stringified key is below the threshold. Stable across
    runs, engines, partitionings, and cluster sizes; zero shuffle."""
    if not 0 <= threshold_256 <= 256:
        raise ValueError("threshold_256 must be in [0, 256]")
    if threshold_256 == 256:
        # keep-all short-circuit: format(256, "02x") is the 3-char literal
        # "100", and a 2-char md5 prefix compared lexicographically against
        # it would keep only prefixes starting "0" or exactly "10" (~6.6%)
        return df
    hexlit = format(threshold_256, "02x")
    return df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 2) < hexlit)


def group_cap(df: DataFrame, group_col: str, cap: int,
              order_col: str) -> DataFrame:
    """At most ``cap`` rows per group, taking the first ``cap`` by
    ``order_col`` (deterministic — order_col must be unique within a
    group). One window shuffle on the group key; the rank is computed
    streaming within each partition, no buffering beyond the frame."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn"))


def with_split(df: DataFrame, key_col: str, splits: dict) -> DataFrame:
    """Deterministic dataset split assignment: md5(key)'s first 4 hex
    digits (uniform in [0, 65536)) cut by cumulative split weights.
    ``splits`` maps name -> weight (weights need not sum to 1; they are
    normalized).  Adds a ``split`` column; stable across runs, engines,
    partitionings and cluster sizes — the reproducible train/val/test
    carve every training pipeline needs (a random split is neither
    reproducible nor consistent when the corpus is re-sharded).
    Zero shuffle: a pure projection."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = float(sum(splits.values()))
    bucket = F.conv(F.substring(
        F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10).cast("int")
    acc = 0.0
    expr = None
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name] / total
        cond = bucket < int(round(acc * 65536))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def mixture_sample(df: DataFrame, source_col: str, rates: dict,
                   key_col: str, default_rate: float = 1.0) -> DataFrame:
    """Deterministic per-source downsampling to hit a target data MIXTURE —
    the step that turns raw per-source volumes into the sampling weights a
    training run actually consumes (e.g. keep 100% of books, 10% of crawl).

    Keep a row iff md5('mix:' || key)'s first 4 hex digits (uniform in
    [0, 65536)) fall below round(rate * 65536) for its source; sources not
    in ``rates`` use ``default_rate``.  The 'mix:' salt decorrelates this
    carve from with_split/hash_sample on the same key.  Reproducible
    across runs, engines, partitionings and cluster sizes; zero shuffle —
    a pure narrow filter that composes with column pruning and runs
    inline in any 100-TB scan."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col(key_col).cast("string"))),
        1, 4), 16, 10).cast("int")
    cut = None
    for s in sorted(rates):
        lim = F.lit(int(round(rates[s] * 65536)))
        cut = (F.when(F.col(source_col) == s, lim) if cut is None
               else cut.when(F.col(source_col) == s, lim))
    lim_default = F.lit(int(round(default_rate * 65536)))
    cut = lim_default if cut is None else cut.otherwise(lim_default)
    return df.filter(bucket < cut)


def temperature_mix(df: DataFrame, source_col: str, key_col: str,
                    target_rows: int, sqrt_temperature: bool = True
                    ) -> DataFrame:
    """Temperature-smoothed source mixing: derive per-source keep-rates
    from the corpus' OWN source counts so the kept mixture follows
    p_s ∝ n_s^0.5 (alpha = 0.5, the multilingual-LM upsampling temperature
    from the XLM-R / mBERT lineage) scaled to ~``target_rows`` total, then
    apply the same md5-bucket carve as ``mixture_sample``.

    Unlike ``mixture_sample`` (static caller-supplied rates), the rates are
    DATA-DERIVED in one tiny aggregation (O(sources) rows — computed inside
    the plan, no driver round-trip), joined back broadcast, and the filter
    stays a narrow hash compare.  Smoothing is fixed to sqrt rather than an
    arbitrary pow(x, alpha) so both engines hit their correctly-rounded
    IEEE sqrt and the carve is bit-reproducible cross-engine.

    Scale: ONE partial-agg shuffle over (source) + a broadcast join — the
    corpus is scanned once, and at 100 TB the scan prunes to (source, key)
    columns only."""
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    if not sqrt_temperature:
        raise NotImplementedError("only alpha=0.5 (sqrt) is supported")
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n"))
    # p_s = sqrt(n_s) / Σ sqrt(n_t); keep-rate r_s = min(1, target·p_s/n_s)
    rates = (counts
             .withColumn("_w", F.sqrt(F.col("_n")))
             .withColumn("_wsum", F.sum("_w").over(Window.partitionBy()))
             .withColumn("keep_rate",
                         F.least(F.lit(1.0),
                                 F.lit(float(target_rows)) * F.col("_w")
                                 / F.col("_wsum") / F.col("_n")))
             .select(source_col, "keep_rate"))
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col(key_col).cast("string"))),
        1, 4), 16, 10).cast("int")
    return (df.join(F.broadcast(rates), source_col)
            .filter(bucket < F.floor(F.col("keep_rate") * 65536.0)
                    .cast("int"))
            .drop("keep_rate"))


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    key_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k rows with
    inclusion probability proportional to ``weight_col`` — Efraimidis &
    Spirakis' A-Res ("Weighted random sampling with a reservoir", IPL
    2006): each row gets the key u^(1/w) for u ~ Uniform(0,1) and the
    top-k keys are the sample.  Here u is md5-derived from ``key_col``
    (first 8 hex digits, midpoint-adjusted to (0,1)), so the sample is
    reproducible across runs, engines, partitionings and cluster sizes —
    and ANSI-SQL-expressible for the oracle.  We rank by the monotone
    transform ln(u)/w (same argmax set, no tiny-exponent underflow at
    large weights).

    This is the quality-weighted subsample every curation pipeline draws
    (train on the best slice, weight = quality/length score).  Scale
    shape: one narrow projection + TakeOrderedAndProject top-k — no
    global sort, no shuffle beyond the k-row reduction.

    Weights must be > 0 (rows with NULL/non-positive weight are
    excluded, matching w->0 limit: never sampled).  Adds ``es_key``."""
    u = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
                16, 10).cast("double") + 0.5) / F.lit(float(1 << 32))
    es = F.log(u) / F.col(weight_col).cast("double")
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("es_key", es)
            .orderBy(F.desc("es_key"))
            .limit(k))


def epoch_order(df: DataFrame, key_col: str, epoch: int,
                n_shards: int = 8) -> DataFrame:
    """Deterministic multi-epoch training shuffle: assign every row a
    (shard, pos) reading order for the given epoch, keyed on
    md5(key ":" epoch) so each epoch is an independent, reproducible
    permutation — the same order on every run, engine, partitioning and
    cluster size (no ``rand()``, no zipWithIndex driver dependence).

    Layout: the hash's first 4 hex digits pick the shard (mod n_shards);
    ``pos`` is the dense rank of the full hash within the shard.  A
    training loader reads shard s sequentially at position order; at
    corpus scale this is ONE window shuffle on the shard key and each
    shard sorts independently (n_shards >> executors keeps the per-task
    sort bounded; the window never sees the whole corpus in one
    partition).

    (Reference has no analogue — training-data-pipeline extension.)"""
    key = F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                            F.lit(str(epoch))))
    d = df.withColumn("ekey", key).withColumn(
        "shard", (F.conv(F.substring("ekey", 1, 4), 16, 10)
                  .cast("int") % n_shards))
    w = Window.partitionBy("shard").orderBy("ekey")
    return d.withColumn("pos", F.row_number().over(w)).drop("ekey")
