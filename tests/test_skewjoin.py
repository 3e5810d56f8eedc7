"""Skew-salted join: output parity, fan-out, and plan shape.

The north rule demands explicit skew handling; operators/skewjoin.py is
the JOIN counterpart of the salted KLL treeAggregate.  The contract under
test: (1) salting never changes the join result, (2) the hot key's fact
rows actually spread across all n_salts sub-keys, (3) the physical plan
is a shuffled hash join keyed on (key, salt) — not a broadcast that
would silently erase the fan-out.
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.operators.skewjoin import (
    SALT, salted_join)


def _dim(spark):
    return spark.createDataFrame(
        [("pcm_s16le", 16), ("mulaw", 8), ("alaw", 8)],
        ["codec", "bits_per_sample"])


def test_salted_join_matches_plain_join(spark, clips):
    fact = clips.select("rid", "codec", "dur_ms")
    dim = _dim(spark)
    got = (salted_join(fact, dim, "codec", salt_from="rid", n_salts=8)
           .groupBy("codec")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("dur_ms").alias("s"),
                F.max("bits_per_sample").alias("b")))
    want = (fact.join(dim, "codec")
            .groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("dur_ms").alias("s"),
                 F.max("bits_per_sample").alias("b")))
    assert sorted(got.collect()) == sorted(want.collect())


def test_salted_join_left_preserves_misses(spark, clips):
    """Left join keeps fact rows whose key has no dim match (the injected
    'opus' rows) exactly once — replication must not multiply them."""
    fact = clips.select("rid", "codec")
    got = salted_join(fact, _dim(spark), "codec", salt_from="rid",
                      n_salts=4, how="left")
    assert got.count() == fact.count()
    misses = got.filter("bits_per_sample IS NULL").count()
    assert misses == fact.filter("codec = 'opus'").count() > 0


def test_hot_key_fans_out_over_all_salts(spark, clips):
    """80% of clips are pcm_s16le (FIXTURES.md hot-key skew); after
    salting, that key's rows must occupy ALL n_salts sub-keys, no sub-key
    holding more than a loose 2x of an even share."""
    n_salts = 8
    fact = clips.select("rid", "codec")
    salted = fact.withColumn(
        SALT, F.pmod(F.xxhash64("rid"), F.lit(n_salts)).cast("int"))
    dist = (salted.filter("codec = 'pcm_s16le'")
            .groupBy(SALT).count().collect())
    counts = {r[SALT]: r["count"] for r in dist}
    assert set(counts) == set(range(n_salts))
    total = sum(counts.values())
    assert max(counts.values()) <= 2 * total / n_salts


def test_salted_join_plan_is_keyed_shuffle(spark, clips):
    fact = clips.select("rid", "codec", "dur_ms")
    df = salted_join(fact, _dim(spark), "codec", salt_from="rid",
                     n_salts=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ShuffledHashJoin" in plan
    assert SALT in plan.split("ShuffledHashJoin")[0] or SALT in plan
    assert "hashpartitioning(codec" in plan
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan
