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


_LUT_RAW: dict = {}


def _decode_lut_raw(codec: str) -> np.ndarray:
    """256-entry byte -> raw int16 sample value (as float64) table for the
    G.711 codecs — decode becomes one np.take into a scratch view."""
    t = _LUT_RAW.get(codec)
    if t is None:
        allb = np.arange(256, dtype=np.uint8).tobytes()
        t = audio.decode(allb, codec).astype(np.float64)
        _LUT_RAW[codec] = t
    return t


# Rows per vectorized sub-chunk.  The kernel decodes the whole chunk into
# per-worker scratch buffers (3 x float64 x total-samples); at 8,192-row Arrow
# batches that was ~3 x 131 MB whose first-touch page faults dominated wall
# time on fresh python workers (round-2 bench regression: q_invariant 90s warm
# vs 8s).  1,024 rows bounds the scratch high-water to ~25-50 MB/worker while
# keeping the reduceat vectorization win (kernel is ~4x faster than the
# per-row loop once pages are warm).
_CHUNK_ROWS = 1024


def _batch_invariant(batch: pd.DataFrame, store_rate: int) -> pd.DataFrame:
    """Vectorized decode + SNR over the Arrow batch, processed in bounded
    sub-chunks of ``_CHUNK_ROWS`` rows so per-worker scratch memory stays
    small (see ``_CHUNK_ROWS``).  Empty batches return an empty result frame
    with the RESULT_SCHEMA columns."""
    n = len(batch)
    if n == 0:
        return pd.DataFrame({
            "rid": pd.Series(dtype=np.int64),
            "clip_id": pd.Series(dtype=object),
            "part": pd.Series(dtype=np.int32),
            "snr_db": pd.Series(dtype=np.float64),
            "len_ok": pd.Series(dtype=bool),
            "transcript_ok": pd.Series(dtype=bool),
            "passed": pd.Series(dtype=bool),
        })
    if n <= _CHUNK_ROWS:
        return _chunk_invariant(batch, store_rate)
    return pd.concat(
        [_chunk_invariant(batch.iloc[lo:lo + _CHUNK_ROWS], store_rate)
         for lo in range(0, n, _CHUNK_ROWS)],
        ignore_index=True)


def _chunk_invariant(batch: pd.DataFrame, store_rate: int) -> pd.DataFrame:
    """Vectorized decode + SNR over one sub-chunk: both sides are
    decoded into per-worker scratch signal buffers (LUT take / int16 view
    cast — see multimodal._scratch for the allocation discipline), then
    signal and noise powers reduce per clip via add.reduceat. Per-row
    Python is O(1) view slicing; undecodable / length-mismatched payloads
    fail closed (snr=-inf, len_ok=False) exactly as before."""
    from .multimodal import _scratch
    n = len(batch)
    bufs = batch["bytes"].to_numpy()
    rbufs = batch["ref_bytes"].to_numpy()
    codecs = batch["codec"].to_numpy()
    rcodecs = batch["ref_codec"].to_numpy()

    ns = np.empty(n, dtype=np.int64)
    rns = np.empty(n, dtype=np.int64)
    ok = np.ones(n, dtype=bool)
    for i in range(n):
        w = 1 if codecs[i] in ("mulaw", "alaw") else 2
        rw = 1 if rcodecs[i] in ("mulaw", "alaw") else 2
        m, rm = len(bufs[i]) // w, len(rbufs[i]) // rw
        # fail closed on truncated/odd-length pcm or mismatched lengths
        if (w == 2 and len(bufs[i]) != 2 * m) or \
           (rw == 2 and len(rbufs[i]) != 2 * rm) or m != rm or m == 0:
            ok[i] = False
            m = rm = 1
        ns[i] = m
        rns[i] = rm

    total = int(ns.sum())
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    np.cumsum(ns[:-1], out=starts[1:])
    a = _scratch("inv_a", total, np.float64)   # test side, raw i16 values
    b = _scratch("inv_b", total, np.float64)   # ref side
    for i in range(n):
        va = a[starts[i]:starts[i] + ns[i]]
        vb = b[starts[i]:starts[i] + ns[i]]
        if not ok[i]:
            va[:] = 0.0
            vb[:] = 0.0
            continue
        if codecs[i] in ("mulaw", "alaw"):
            np.take(_decode_lut_raw(codecs[i]),
                    np.frombuffer(bufs[i], np.uint8, count=ns[i]), out=va)
        else:
            va[:] = np.frombuffer(bufs[i], "<i2", count=ns[i])
        if rcodecs[i] in ("mulaw", "alaw"):
            np.take(_decode_lut_raw(rcodecs[i]),
                    np.frombuffer(rbufs[i], np.uint8, count=ns[i]), out=vb)
        else:
            vb[:] = np.frombuffer(rbufs[i], "<i2", count=ns[i])

    # noise = sum((ref-test)^2), signal = sum(ref^2), per clip
    diff = _scratch("inv_d", total, np.float64)
    np.subtract(b, a, out=diff)
    np.multiply(diff, diff, out=diff)
    noise = np.add.reduceat(diff, starts)
    np.multiply(b, b, out=diff)
    sig = np.add.reduceat(diff, starts)
    with np.errstate(divide="ignore", invalid="ignore"):
        snr = 10.0 * np.log10(sig / noise)
    snr[sig == 0.0] = float("-inf")     # silent reference
    snr[noise == 0.0] = float("inf")    # bit-identical (wins over silent,
    #                                     matching audio.snr_db's ordering)
    snr[~ok] = float("-inf")            # mismatch/undecodable fails closed

    expected = np.round(
        batch["dur_ms"].to_numpy().astype(np.float64) * store_rate / 1000.0)
    len_ok = ok & (ns == expected.astype(np.int64))
    t = batch["transcript"]
    t_ok = (t.eq(batch["ref_transcript"]) & t.notna()).to_numpy()
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
