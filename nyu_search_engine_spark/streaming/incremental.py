"""Incremental indexing via Structured Streaming (SURVEY.md §2.9).

The reference is batch-only; this is the noted forward path: readStream
on the corpus table -> foreachBatch(build_partial_index). Each micro-batch
becomes its own shard-group-style index segment under
``out/segments/seg=<epoch>`` with a manifest row — the same
segment-per-checkpoint idea the batch builder uses, so a segment-merging
compactor (or the query engine reading all segments) sees one logical
index. Checkpointing gives exactly-once segment writes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.build_index import build_index


def start_incremental_index(
    spark: SparkSession,
    stream_df: DataFrame,
    out: str,
    checkpoint: str,
    shard_size: int = 50_000,
    trigger_once: bool = True,
):
    """Start a streaming query that indexes each micro-batch as a segment.

    ``stream_df`` must be a streaming DataFrame in the corpus shape
    (repo, path, commit, lang, content). Returns the StreamingQuery.
    """

    def index_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.rdd.isEmpty():
            return
        seg = os.path.join(out, "segments", f"seg={epoch_id}")
        build_index(
            batch_df.sparkSession, batch_df, seg,
            shard_size=shard_size, n_groups=1, resume=False,
        )

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(index_batch)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_segmented_lexicon(spark: SparkSession, out: str) -> DataFrame:
    """Global lexicon over all streamed segments (post-merge of per-segment
    stats, same groupBy(term) shape as the batch builder's)."""
    from pyspark.sql import functions as F

    seg_glob = os.path.join(out, "segments", "seg=*", "lexicon")
    lex = spark.read.parquet(seg_glob)
    return lex.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.sum("n_slices").alias("n_slices"),
        F.max("max_tfn").alias("max_tfn"),
    )
