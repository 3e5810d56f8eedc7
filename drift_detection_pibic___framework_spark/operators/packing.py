"""Sequence packing for training-data pipelines: concatenate documents in
a deterministic order and split the token stream into fixed-budget training
sequences (GPT-style pack-and-split), assigning every document its sequence
id and offset.

The hard part at 100 TB is the GLOBAL running token offset — a naive
``Window.orderBy(...)`` global cumsum collapses the whole corpus into ONE
sort partition.  This module uses the classic two-phase distributed prefix
sum instead, with a twist that avoids RangePartitioner's sampled (and
therefore not run-deterministic) boundaries: the pack order is an md5 hash
of the document key, so equal-width slices OF THE HASH SPACE are balanced
by construction and computable per-row with no sampling pass:

1. shard = first 4 hex digits of the sort hash, scaled to [0, num_shards)
   — deterministic, contiguous in pack order, uniform in size;
2. one hash-shuffle window per shard computes the shard-local exclusive
   cumsum (shards are uniform-width hash slices — no skew hazard);
3. per-shard token totals (num_shards rows — bounded by contract) are
   collected, prefix-summed on the driver, and broadcast-joined back.

Total cost: ONE data shuffle + a num_shards-row collect + a broadcast
join.  Every phase is built-in DataFrame ops (whole-stage codegen).

(The reference has no packing analogue — SURVEY §1.2; this is part of the
training-data-pipeline extension required by the build brief.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import text as text_ops
from pyspark.sql.functions import broadcast


def chunk_text(docs: DataFrame, window: int = 512, stride: int = 256,
               col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split each document into overlapping token windows — the
    embedding-corpus / retrieval-index chunker (every RAG and embedding
    pipeline cuts long documents into ``window``-token chunks with
    ``stride`` overlap so no passage is lost at a boundary; distinct
    from pack_sequences, which concatenates docs for TRAINING).

    Chunk starts step by ``stride`` from 0; the last window is the final
    full-or-partial slice, and a doc shorter than ``window`` is one
    chunk.  Pure array expressions over the whitespace token split —
    zero shuffle, zero Python; chunk count per doc is
    ceil(max(n - window, 0) / stride) + 1.

    Returns one row per chunk: (doc_id, chunk_id, start_tok, n_tok,
    chunk_text) with 0-based token offsets into the trimmed whitespace
    token stream."""
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = text_ops.tokens(col)
    n = F.size(toks)
    n_chunks = (F.ceil(F.greatest(n - window, F.lit(0))
                       / F.lit(float(stride))).cast("int") + 1)
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1),
                         lambda c: c * stride)
    chunks = F.transform(
        starts,
        lambda s, c: F.struct(
            c.alias("chunk_id"), s.alias("start_tok"),
            F.least(n - s, F.lit(window)).alias("n_tok"),
            F.concat_ws(" ", F.slice(toks, s + 1, window))
            .alias("chunk_text")))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(chunks).alias("c"))
            .select("doc_id", "c.chunk_id", "c.start_tok", "c.n_tok",
                    "c.chunk_text"))


def pack_sequences(docs: DataFrame, budget: int,
                   token_col: str = "n_tokens", key_col: str = "doc_id",
                   num_shards: int = 32) -> DataFrame:
    """Assign each document a training-sequence id and intra-sequence
    offset under GPT-style concatenate-then-split packing with ``budget``
    tokens per sequence (documents may straddle sequence boundaries).

    Pack order is md5('pack:' || key) — reproducible across runs, engines,
    partitionings and cluster sizes.  Adds columns:

    - ``seq_id``: sequence containing the document's FIRST token;
    - ``offset_in_seq``: the first token's offset within that sequence;
    - ``n_seqs_spanned``: how many sequences the document crosses.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if num_shards <= 0 or num_shards > 65536:
        raise ValueError("num_shards must be in [1, 65536]")
    sort_key = F.md5(F.concat(F.lit("pack:"),
                              F.col(key_col).cast("string")))
    shard = (F.conv(F.substring(sort_key, 1, 4), 16, 10).cast("int")
             * num_shards / 65536).cast("int")
    d = docs.withColumn("_sk", sort_key).withColumn("_shard", shard)

    # phase 1+2: shard totals (num_shards rows — bounded by contract),
    # driver prefix sum, broadcast back
    totals = (d.groupBy("_shard")
              .agg(F.sum(token_col).cast("long").alias("_tok"))
              .collect())
    acc, offsets = 0, []
    for row in sorted(totals, key=lambda r: r["_shard"]):
        offsets.append((row["_shard"], acc))
        acc += row["_tok"]
    off = docs.sparkSession.createDataFrame(
        offsets, "_shard int, _shard_offset long")

    # phase 3: shard-local EXCLUSIVE cumsum — the one data shuffle
    w = (Window.partitionBy("_shard").orderBy("_sk", key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = (F.coalesce(F.sum(token_col).over(w), F.lit(0))
             + F.col("_shard_offset")).cast("long")
    end = start + F.col(token_col)
    return (d.join(broadcast(off), "_shard")
            .withColumn("seq_id", F.floor(start / budget))
            .withColumn("offset_in_seq", start % budget)
            .withColumn("n_seqs_spanned",
                        (F.floor((end - 1) / budget)
                         - F.col("seq_id") + 1).cast("long"))
            .drop("_sk", "_shard", "_shard_offset"))
