"""Per-row invariant: decoded-PCM SNR >= 30 dB + transcript equality vs the
pristine reference copy, inside an Arrow-batched UDF (BASELINE.json
input_hint: "decoded-PCM allclose (SNR>=30dB) + transcript equality ...
asserted per-row inside an Arrow UDF").

Scale notes (this is the ONLY check that touches the ``bytes`` column):
- the join with ``clips_ref`` is an equi-join on ``(rid)`` — rid is the
  row-lineage id (Iceberg v3 row-lineage analog), unique and uniformly
  distributed, so the shuffle is skew-free; at production scale both sides
  are bucketed/partitioned identically so the join is co-located;
- decode + SNR runs in ``mapInPandas`` over Arrow batches: per-clip numpy
  vector ops, no per-row Python at the Spark row level;
- the length-consistency check ``len(decoded) == round(dur_ms * rate/1000)``
  takes the store rate as config (sr_hz at production; the fixture's
  STORE_RATE decimation in this sandbox — generators.py docstring).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import audio
from ..sources.generators import STORE_RATE

SNR_THRESHOLD_DB = 30.0

RESULT_SCHEMA = ("rid long, clip_id string, part int, snr_db double, "
                 "len_ok boolean, transcript_ok boolean, passed boolean")


def _batch_invariant(batch: pd.DataFrame, store_rate: int) -> pd.DataFrame:
    n = len(batch)
    snr = np.empty(n, dtype=np.float64)
    len_ok = np.zeros(n, dtype=bool)
    t_ok = np.zeros(n, dtype=bool)
    for i in range(n):
        codec = batch["codec"].iat[i]
        try:
            dec = audio.decode(batch["bytes"].iat[i], codec)
            ref = audio.decode(batch["ref_bytes"].iat[i],
                               batch["ref_codec"].iat[i])
            snr[i] = audio.snr_db(ref, dec)
            len_ok[i] = len(dec) == round(
                batch["dur_ms"].iat[i] * store_rate / 1000)
        except (ValueError, TypeError):
            # undecodable payload (truncated/odd-length buffer) is itself a
            # violation — the check fails closed, never throws
            snr[i] = float("-inf")
            len_ok[i] = False
        a, b = batch["transcript"].iat[i], batch["ref_transcript"].iat[i]
        t_ok[i] = (a == b) and a is not None
    out = pd.DataFrame({
        "rid": batch["rid"].to_numpy(),
        "clip_id": batch["clip_id"].to_numpy(),
        "part": batch["part"].to_numpy(),
        "snr_db": snr,
        "len_ok": len_ok,
        "transcript_ok": t_ok,
    })
    # snr=+inf (bit-identical) passes; -inf/NaN (length mismatch) fails
    out["passed"] = (snr >= SNR_THRESHOLD_DB) & len_ok & t_ok
    return out


def invariant_results(clips: DataFrame, clips_ref: DataFrame,
                      store_rate: int = STORE_RATE) -> DataFrame:
    """Per-row invariant results. Joins clips to the pristine copy on rid and
    evaluates decode/SNR/length/transcript in mapInPandas."""
    ref = clips_ref.select(
        F.col("rid"),
        F.col("bytes").alias("ref_bytes"),
        F.col("codec").alias("ref_codec"),
        F.col("transcript").alias("ref_transcript"))
    joined = clips.select("rid", "clip_id", "part", "bytes", "codec",
                          "dur_ms", "transcript").join(ref, "rid")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield _batch_invariant(b, store_rate)

    return joined.mapInPandas(gen, RESULT_SCHEMA)


def invariant_results_colocated(clips: DataFrame, ref_dir: str,
                                store_rate: int = STORE_RATE) -> DataFrame:
    """Zero-shuffle variant: ``clips_ref`` is stored co-partitioned with
    ``clips`` (same part -> same file layout — the Iceberg identity-partition
    / bucketed-table contract), so instead of a SortMergeJoin that shuffles
    BOTH binary payloads, the kernel loads the matching ref partition
    file(s) directly and aligns on rid in memory.

    At production scale this is the bucketed-join elimination: both tables
    bucketed by rid -> join requires no exchange. Here the executor-side
    pyarrow read plays the bucket-local role; an LRU keeps one ref
    partition per worker."""
    import os

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        def ref_slice(part: int, lo: int, hi: int) -> pd.DataFrame:
            # rid-range filter -> row-group pruning: a task reads only the
            # ref row groups covering ITS split, not the whole partition
            # (fixture files are written with 4096-row row groups)
            f = os.path.join(ref_dir, f"part-{part:04d}.parquet")
            return (pq.read_table(
                f, columns=["rid", "bytes", "codec", "transcript"],
                filters=[("rid", ">=", lo), ("rid", "<=", hi)])
                .to_pandas().set_index("rid"))

        for b in batches:
            if not len(b):
                continue
            for part, grp in b.groupby("part"):
                ref = ref_slice(int(part), int(grp["rid"].min()),
                                int(grp["rid"].max())).loc[grp["rid"]]
                merged = grp.assign(
                    ref_bytes=ref["bytes"].to_numpy(),
                    ref_codec=ref["codec"].to_numpy(),
                    ref_transcript=ref["transcript"].to_numpy())
                yield _batch_invariant(merged, store_rate)

    cols = clips.select("rid", "clip_id", "part", "bytes", "codec",
                        "dur_ms", "transcript")
    return cols.mapInPandas(gen, RESULT_SCHEMA)


def invariant_results_filepairs(spark, clips_dir: str, ref_dir: str,
                                store_rate: int = STORE_RATE,
                                parts: list = None,
                                rgs_per_task: int = 2) -> DataFrame:
    """Optimal physical plan for the pairwise compare: tasks are row-group
    ranges of co-located (clips, ref) file pairs — both sides are written
    with the SAME row-group layout (generators.py, 4096 rows/group), so a
    task reads the same row-group indices from each file and rows align
    1:1 by rid; zero shuffle; each byte read exactly once, locally.
    Task count = parts * ceil(row_groups / rgs_per_task), so parallelism
    scales with data volume, not partition count (the local[8]->local[32]
    scaling gate needs >> 32 tasks).  This is what a bucketed-by-rid
    Iceberg layout gives a 1000-executor cluster.  Row parity with
    invariant_results is asserted in tests."""
    import os

    import pyarrow.parquet as pq

    if parts is None:
        parts = sorted(
            int(f[len("part-"):-len(".parquet")])
            for f in os.listdir(clips_dir)
            if f.startswith("part-") and f.endswith(".parquet"))
    tasks = []
    for p in parts:
        cf = os.path.join(clips_dir, f"part-{p:04d}.parquet")
        rf = os.path.join(ref_dir, f"part-{p:04d}.parquet")
        nrg = pq.ParquetFile(cf).metadata.num_row_groups
        for lo in range(0, nrg, rgs_per_task):
            tasks.append((cf, rf, list(range(lo, min(lo + rgs_per_task,
                                                     nrg)))))

    def run_chunk(task) -> list:
        cf, rf, rgs = task
        c = pq.ParquetFile(cf).read_row_groups(
            rgs, columns=["rid", "clip_id", "part", "bytes", "codec",
                          "dur_ms", "transcript"]).to_pandas()
        r = pq.ParquetFile(rf).read_row_groups(
            rgs, columns=["rid", "bytes", "codec", "transcript"]
        ).to_pandas().set_index("rid")
        ref = r.loc[c["rid"]]
        merged = c.assign(ref_bytes=ref["bytes"].to_numpy(),
                          ref_codec=ref["codec"].to_numpy(),
                          ref_transcript=ref["transcript"].to_numpy())
        out = _batch_invariant(merged, store_rate)
        return list(out.itertuples(index=False, name=None))

    rdd = (spark.sparkContext
           .parallelize(tasks, numSlices=len(tasks))
           .flatMap(run_chunk))
    return spark.createDataFrame(rdd, schema=RESULT_SCHEMA)


def invariant_violations(clips: DataFrame, clips_ref: DataFrame,
                         store_rate: int = STORE_RATE) -> DataFrame:
    """Violation rows for failing clips (north_rule shape)."""
    res = invariant_results(clips, clips_ref, store_rate)
    return res.filter(~F.col("passed")).select(
        F.col("clip_id"),
        F.lit("invariant(pcm_snr)").alias("check_name"),
        F.concat(F.lit("snr="), F.round("snr_db", 2).cast("string"),
                 F.lit(" len_ok="), F.col("len_ok").cast("string"),
                 F.lit(" transcript_ok="), F.col("transcript_ok").cast("string"))
        .alias("observed"),
        F.lit(f"snr >= {SNR_THRESHOLD_DB} dB, length & transcript match")
        .alias("expected"),
        F.col("part"))


def invariant_verdicts(clips: DataFrame, clips_ref: DataFrame,
                       store_rate: int = STORE_RATE) -> DataFrame:
    """Per-partition pass/fail + min SNR observed."""
    res = invariant_results(clips, clips_ref, store_rate)
    per = res.groupBy("part").agg(
        F.sum(F.when(~F.col("passed"), 1).otherwise(0)).alias("bad"),
        F.count(F.lit(1)).alias("n"),
        F.min(F.when(F.col("snr_db") != float("inf"), F.col("snr_db")))
        .alias("min_snr"))
    return per.select(
        "part",
        F.lit("invariant(pcm_snr)").alias("check_name"),
        (F.col("bad") == 0).alias("passed"),
        F.concat(F.lit("bad="), F.col("bad").cast("string"), F.lit("/"),
                 F.col("n").cast("string")).alias("observed"),
        F.lit("bad=0").alias("expected"))
