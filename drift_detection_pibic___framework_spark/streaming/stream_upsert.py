"""CDC-style streaming upsert sink: apply a change feed into a TableIO
table, latest-per-key wins.

(Extension beyond the reference's replay-only stream simulation —
/root/reference/utils/StreamProcessor.py processes a fixed stream once
and never revises a past observation; a production feed does.)

The batch engine owns corpus state in TableIO tables; this sink is the
continuous path for feeds that CORRECT earlier rows (re-transcribed
clips, fixed metadata, late-arriving replacements) rather than append new
ones.  Each micro-batch becomes ONE merge-on-read upsert commit
(sources/tableio.py): the batch's rows supersede every earlier row
sharing their key, readers see the merged state immediately, and
jobs/maintain.py --rewrite folds the history down on schedule.

Exactly-once under foreachBatch's at-least-once contract, same recipe as
the gate stream (stream_validate.py): the epoch -> snapshot mapping
commits to a TableIO manifest row AFTER the upsert, so a replayed epoch
finds its row and skips the commit.  A file-source epoch's content is
deterministic, so the first commit already holds exactly its data.

Within one micro-batch the feed may carry several versions of a key
(retry bursts); ``order_col`` picks the survivor (greatest wins) BEFORE
the commit — one window over the batch, so the upsert's marker semantics
stay per-commit-unique-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

UPSERT_SCOPE = "stream_upsert_epochs"


def latest_per_key(batch: DataFrame, key: str, order_col: str) -> DataFrame:
    """Reduce a change-feed batch to its latest row per key (greatest
    ``order_col``; ties broken arbitrarily but deterministically by the
    remaining columns via the row_number sort)."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (batch.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1").drop("_rn"))


def apply_changes_into(spark: SparkSession, stream: DataFrame, io,
                       table: str, key: str, order_col: str,
                       checkpoint_dir: str,
                       available_now: bool = True):
    """Start the change-applying sink; returns the StreamingQuery.
    ``io`` is a ParquetTableIO; the target ``table`` accumulates one
    upsert commit per micro-batch (exactly-once via the epoch manifest)."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if int(epoch_id) in io.read_manifest(UPSERT_SCOPE):
            return
        reduced = latest_per_key(batch, key, order_col)
        if not reduced.head(1):
            return
        snap = io.upsert(reduced, table, key)
        io.commit_manifest_row(UPSERT_SCOPE, int(epoch_id), {"snap": snap})

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
