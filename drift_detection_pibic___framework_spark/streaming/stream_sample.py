"""Streaming weighted reservoir: maintain an exact k-row quality-weighted
sample of an UNBOUNDED ingest.

Efraimidis & Spirakis' A-Res key (u^(1/w), here the monotone ln(u)/w with
md5-derived u — operators/sampling.py weighted_sample) has the reservoir
property: the top-k keys over any prefix of the stream ARE a weighted
sample without replacement of that prefix.  So the reservoir update is
pure set algebra — union the current reservoir with the new batch, keep
the top-k keys — and the sample is EXACT at every epoch, not an
approximation that degrades with stream length.

Exactly-once under foreachBatch's at-least-once contract: the es key is
deterministic (md5 of the row key), so replaying an epoch unions rows
that are already reservoir members and the dropDuplicates + top-k
reproduces the identical reservoir; the TableIO ``rewrite`` commit is
atomic, so readers always see a complete reservoir generation.

Scale shape: the reservoir is k rows (tiny); each epoch costs one narrow
scoring projection over the batch + a top-k reduction over batch+k rows —
no state store, no shuffle beyond TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

RESERVOIR_TABLE = "weighted_reservoir"


def update_reservoir(io, current: DataFrame, batch: DataFrame,
                     weight_col: str, k: int,
                     key_col: str = "doc_id") -> str:
    """One reservoir step: rewrite the table to the top-k A-Res keys of
    (current reservoir) union (batch).  Returns the snapshot id."""
    from ..operators.sampling import weighted_sample

    pool = batch if current is None else \
        batch.unionByName(current.select(*batch.columns))
    top = (weighted_sample(pool.dropDuplicates([key_col]),
                           weight_col, k, key_col=key_col)
           .drop("es_key"))
    return io.rewrite(top, RESERVOIR_TABLE)


def run_weighted_reservoir_stream(spark: SparkSession, in_dir: str,
                                  schema: str, io_root: str,
                                  checkpoint_dir: str, k: int,
                                  weight_col: str,
                                  key_col: str = "doc_id",
                                  max_files_per_trigger: int = 1,
                                  available_now: bool = True):
    """Drive the reservoir over a file-source stream; the reservoir lives
    at ``<io_root>/weighted_reservoir`` (TableIO snapshots — every epoch
    is one atomic rewrite generation, time-travel-able until vacuum)."""
    from ..sources.tableio import ParquetTableIO

    io = ParquetTableIO(io_root)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(in_dir))

    def handle(batch: DataFrame, epoch_id: int) -> None:
        # membership from the snapshot LOG, not has_appended's directory
        # glob: a crash between the rewrite's data write and its log
        # commit leaves a torn snap- dir that the glob fallback would
        # try to read on replay, crash-looping the stream; the log sees
        # only committed generations (the torn dir is vacuum()-able)
        current = io.read_appended(spark, RESERVOIR_TABLE) \
            if io.snapshots(RESERVOIR_TABLE) else None
        update_reservoir(io, current, batch, weight_col, k, key_col)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
