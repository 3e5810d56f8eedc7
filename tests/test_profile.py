"""Constraint-suggestion profiler (operators/profile.py): profile
correctness vs a pandas model, each suggestion rule on a crafted frame,
and the closed loop — suggest on a clean baseline, run the suggested
suite on the dirty clips table, and the injected violations must fail
exactly the right checks."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.operators import profile as P


@pytest.fixture(scope="module")
def toy(spark):
    pdf = pd.DataFrame({
        "uid": ["a", "b", "c", "d", "e", "f"],
        "cat": ["x", "y", "x", "x", "y", "x"],
        "val": [10, 20, 30, 40, 50, 60],
        "maybe": ["t", None, "t", "u", None, "t"],
    })
    return spark.createDataFrame(pdf)


def test_profile_matches_pandas_model(spark, toy):
    prof = {r.column: r for r in
            P.column_profiles(toy, exact_distinct=True).collect()}
    assert set(prof) == {"uid", "cat", "val", "maybe"}

    u = prof["uid"]
    assert (u.dtype, u.n_rows, u.n_nonnull, u.n_distinct) == \
        ("string", 6, 6, 6)
    assert u.completeness == 1.0
    assert (u.min_len, u.max_len) == (1, 1)
    assert u.min_num is None and u.mean is None

    v = prof["val"]
    assert (v.dtype, v.n_distinct) == ("numeric", 6)
    assert (v.min_num, v.max_num) == (10.0, 60.0)
    assert v.mean == pytest.approx(35.0)
    assert v.stddev == pytest.approx(pd.Series([10, 20, 30, 40, 50, 60])
                                     .std(), abs=1e-6)
    assert v.min_len is None

    m = prof["maybe"]
    assert (m.n_nonnull, m.n_distinct) == (4, 2)
    assert m.completeness == pytest.approx(4 / 6, abs=1e-6)


def test_profile_single_pass_plan(toy):
    plan = P.column_profiles(toy, exact_distinct=False) \
        ._jdf.queryExecution().executedPlan().toString()
    # one aggregation over the input: no join, no second scan
    assert "Join" not in plan


def test_suggestion_rules(spark, toy):
    sug = {(r.column, r.constraint): r.params
           for r in P.suggest_constraints(
               toy, max_domain=3, exact_distinct=True).collect()}
    assert ("uid", "not_null") in sug
    assert ("uid", "unique") in sug            # complete + all-distinct
    assert ("cat", "isin") in sug and sug[("cat", "isin")] == "x,y"
    assert ("val", "range") in sug and sug[("val", "range")] == "[10,60]"
    assert ("maybe", "completeness_pct_ge") in sug
    assert sug[("maybe", "completeness_pct_ge")] == "66"   # floor(4/6*100)
    assert ("maybe", "unique") not in sug      # nulls forbid unique
    assert ("val", "isin") not in sug          # 6 distinct > max_domain 3
    assert ("maybe", "isin") in sug and sug[("maybe", "isin")] == "t,u"


def test_suggested_suite_catches_injections(spark, clips):
    # the trusted baseline: clips filtered to rows free of the injected
    # defects (a curated baseline window — the real-world suggestion input)
    cols = ["clip_id", "sr_hz", "codec", "transcript"]
    clean = clips.filter(
        (F.col("sr_hz") != 192000) & F.col("transcript").isNotNull()
        & F.col("codec").isin("pcm_s16le", "mulaw", "alaw"))
    sug = P.suggest_constraints(clean.select(*cols, "part"), cols=cols,
                                exact_distinct=True)
    names = {(r.column, r.constraint) for r in sug.collect()}
    assert ("transcript", "not_null") in names
    assert ("codec", "isin") in names
    assert ("sr_hz", "range") in names
    # injected duplicate clip_ids survive the clean filter -> never unique
    assert ("clip_id", "unique") not in names

    # the clean baseline passes its OWN suggested suite everywhere
    assert all(r.passed for r in
               P.suggested_suite_verdicts(clean, sug).collect())

    by_check = {}
    for r in P.suggested_suite_verdicts(clips, sug).collect():
        by_check.setdefault(r.check_name, []).append(r)
    # dirty clips: injected 192 kHz sr_hz outliers breach the suggested
    # range; injected transcript nulls breach not_null; injected 'opus'
    # codec rows breach the suggested isin domain
    assert any(not r.passed for r in by_check["range(sr_hz)"])
    assert any(not r.passed for r in by_check["not_null(transcript)"])
    assert any(not r.passed for r in by_check["isin(codec)"])
    # every partition yields one verdict row per suggested check
    n_parts = clips.select("part").distinct().count()
    for name, rows in by_check.items():
        assert len(rows) == n_parts, name


def test_suggested_suite_unknown_constraint_raises(spark, toy):
    with pytest.raises(ValueError):
        P.suggested_suite_verdicts(toy.withColumn("part", F.lit(0)),
                                   [("uid", "regex_match", ".*")])


# -------------------------------------------------------------------------
# self-consistency property: ANY table passes its own suggested constraints
# -------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_strs = st.one_of(st.none(), st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
    max_size=8))
_ints = st.one_of(st.none(), st.integers(-2**62, 2**62))
_dbls = st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(_strs, _ints, _dbls),
                     min_size=1, max_size=30),
       exact=st.booleans())
def test_table_satisfies_own_suggestions(spark, rows, exact):
    """The closed-loop invariant behind the whole feature: constraints
    suggested FROM a table must PASS on that same table (single-partition
    scope — completeness floors are global-scope by construction, so the
    one-partition frame makes per-part == global).  Exercises nulls,
    all-null columns, NaN/inf (no range suggested), extreme magnitudes
    (outward bound rounding), comma-bearing category values (isin
    suppressed), and both distinct-count modes."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("s", T.StringType(), True),
        T.StructField("i", T.LongType(), True),
        T.StructField("d", T.DoubleType(), True),
    ])
    df = (spark.createDataFrame(rows, schema)
          .withColumn("part", F.lit(0)))
    sug = P.suggest_constraints(df, cols=["s", "i", "d"],
                                max_domain=5, exact_distinct=exact)
    verdicts = P.suggested_suite_verdicts(df, sug).collect()
    bad = [r for r in verdicts if not r.passed]
    assert not bad, f"self-suite failures: {bad}"


def test_suggested_suite_violations_rows(spark, clips):
    """Row-level contract violations match direct filters exactly, carry
    the north-rule columns, and partition-scope constraints emit none."""
    contract = [
        ("transcript", "not_null", ""),
        ("sr_hz", "range", "[8000,48000]"),
        ("codec", "isin", "alaw,mulaw,pcm_s16le"),
        ("clip_id", "unique", ""),            # partition-scope: no rows
        ("transcript", "completeness_pct_ge", "99"),   # likewise
    ]
    v = P.suggested_suite_violations(clips, contract)
    assert v.columns == ["clip_id", "check_name", "observed", "expected",
                         "part"]
    by = {r[0]: r[1] for r in
          v.groupBy("check_name").count().collect()}
    assert by.get("not_null(transcript)", 0) == \
        clips.filter(F.col("transcript").isNull()).count()
    assert by.get("range(sr_hz)", 0) == \
        clips.filter((F.col("sr_hz") < 8000)
                     | (F.col("sr_hz") > 48000)).count()
    assert by.get("isin(codec)", 0) == \
        clips.filter(~F.col("codec").isin(
            "alaw", "mulaw", "pcm_s16le")).count()
    assert set(by) <= {"not_null(transcript)", "range(sr_hz)",
                       "isin(codec)"}
    # zero-shuffle plan: pure projection + explode, no Exchange
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_suggested_suite_violations_empty_contract(spark, clips):
    v = P.suggested_suite_violations(
        clips, [("clip_id", "unique", "")])
    assert v.count() == 0


def test_suggest_from_sidecars_zero_scan(spark, clips, tmp_path):
    """Sidecar-fold suggestion agrees with the scan path on the same data
    (ranges/domains/not_null identical; unique via HLL marked approx),
    after multi-commit ingestion with all three sidecar families."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)

    io = ParquetTableIO(str(tmp_path))
    # three clean commits (parts 0,1,4: no injected dupes/nulls/codecs)
    clean = clips.filter(F.col("part").isin(0, 1, 4)) \
        .select("clip_id", "sr_hz", "dur_ms", "codec", "transcript", "part")
    for p in (0, 1, 4):
        io.append(clean.filter(F.col("part") == p).repartition(1), "t",
                  stats_cols=("sr_hz", "dur_ms"), cat_cols=("codec",),
                  key_cols=("clip_id",))

    got = {(r.column, r.constraint): r.params for r in
           P.suggest_from_sidecars(spark, io, "t").collect()}
    want = {(r.column, r.constraint): r.params for r in
            P.suggest_constraints(
                clean, cols=["clip_id", "sr_hz", "dur_ms", "codec"],
                exact_distinct=True).collect()}

    # moments: identical range + not_null
    for c in ("sr_hz", "dur_ms"):
        assert got[(c, "range")] == want[(c, "range")]
        assert (c, "not_null") in got
    # MG err==0 at 4 distinct codecs -> exact domain, identical isin
    assert got[("codec", "isin")] == want[("codec", "isin")]
    assert ("codec", "not_null") in got
    # HLL: clean parts have unique ids -> unique suggested, marked approx
    assert got[("clip_id", "unique")] == "approx"
    assert ("clip_id", "not_null") in got
    # zero-scan contract still enforceable: the suggested suite runs
    verd = P.suggested_suite_verdicts(
        clean, [(c, k, v) for (c, k), v in got.items()]).collect()
    assert all(r.passed for r in verd)


def test_suggest_from_sidecars_nulls_and_no_sidecars(spark, clips, tmp_path):
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)

    io = ParquetTableIO(str(tmp_path))
    with pytest.raises(ValueError):
        P.suggest_from_sidecars(spark, io, "missing")
    # a commit with injected transcript nulls -> completeness floor, and
    # cat nulls are invisible to MG counts so codec completeness uses n
    dirty = clips.filter(F.col("part").isin(2, 10)) \
        .select("clip_id", "sr_hz", "transcript", "part")
    io.append(dirty.repartition(1), "d", stats_cols=("sr_hz",),
              cat_cols=("transcript",))
    got = {(r.column, r.constraint): r.params for r in
           P.suggest_from_sidecars(spark, io, "d").collect()}
    assert ("transcript", "completeness_pct_ge") in got
    assert ("transcript", "not_null") not in got
    # 400 long random transcripts: far beyond max_domain -> no isin
    assert ("transcript", "isin") not in got


def test_diff_contracts_classification():
    """Each change class and its drift polarity, driver-side pure diff."""
    pinned = [("t", "not_null", ""), ("s", "range", "[10,20]"),
              ("c", "isin", "a,b"), ("m", "completeness_pct_ge", "95"),
              ("k", "unique", "")]
    observed = [("s", "range", "[5,20]"),          # widened -> drift
                ("c", "isin", "a,b,z"),            # grew -> drift
                ("m", "completeness_pct_ge", "90"),  # lowered -> drift
                ("k", "unique", "approx"),         # params cosmetics
                ("x", "range", "[0,1]")]           # added
    d = {(r["column"], r["constraint"]): r
         for r in P.diff_contracts(pinned, observed)}
    assert d[("t", "not_null")]["change"] == "removed"
    assert d[("t", "not_null")]["drift"]
    assert d[("s", "range")]["change"] == "widened"
    assert d[("s", "range")]["drift"]
    assert d[("c", "isin")]["change"] == "domain_grew"
    assert d[("c", "isin")]["drift"]
    assert d[("m", "completeness_pct_ge")]["change"] == "floor_lowered"
    assert d[("m", "completeness_pct_ge")]["drift"]
    assert not d[("k", "unique")]["drift"]
    assert d[("x", "range")]["change"] == "added"
    assert not d[("x", "range")]["drift"]

    # tightening directions carry no drift
    d2 = {(r["column"], r["constraint"]): r for r in P.diff_contracts(
        [("s", "range", "[5,20]"), ("c", "isin", "a,b,z"),
         ("m", "completeness_pct_ge", "90")],
        [("s", "range", "[10,20]"), ("c", "isin", "a,b"),
         ("m", "completeness_pct_ge", "95")])}
    assert all(not r["drift"] for r in d2.values())
    assert d2[("s", "range")]["change"] == "narrowed"
    assert d2[("c", "isin")]["change"] == "domain_shrank"
    assert d2[("m", "completeness_pct_ge")]["change"] == "floor_raised"

    # identical contracts diff to nothing
    assert P.diff_contracts(pinned, pinned) == []


def test_sidecar_contract_drift_gate(spark, clips, tmp_path):
    """Zero-scan commit gate: pin the clean history's contract, append a
    defect-bearing commit, and the sidecar-fold diff must flag loosened
    constraints without scanning the table."""
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)

    io = ParquetTableIO(str(tmp_path))
    sel = ("clip_id", "sr_hz", "dur_ms", "codec", "transcript", "part")
    clean = clips.filter(F.col("part").isin(0, 1)).select(*sel)
    kw = dict(stats_cols=("sr_hz", "dur_ms"), cat_cols=("codec",),
              key_cols=("clip_id",))
    for p in (0, 1):
        io.append(clean.filter(F.col("part") == p).repartition(1),
                  "t", **kw)
    pinned = [(r.column, r.constraint, r.params) for r in
              P.suggest_from_sidecars(spark, io, "t").collect()]

    # clean history vs its own pin: silent
    assert P.sidecar_contract_drift(spark, io, "t", pinned) == []

    # ingest partitions carrying injected opus codecs + 192 kHz outliers
    dirty = clips.filter(F.col("part").isin(5, 11, 14)).select(*sel)
    io.append(dirty.repartition(1), "t", **kw)
    drift = P.sidecar_contract_drift(spark, io, "t", pinned)
    by = {(d["column"], d["constraint"]): d for d in drift}
    assert by[("codec", "isin")]["change"] == "domain_grew"
    assert by[("codec", "isin")]["drift"]
    assert by[("sr_hz", "range")]["change"] == "widened"
    assert by[("sr_hz", "range")]["drift"]
    # sidecar isin domains come only from MG cat_cols, so no sr_hz isin
    # appears on either side of the diff (sr_hz rides the moment sidecar)
    assert ("sr_hz", "isin") not in by
