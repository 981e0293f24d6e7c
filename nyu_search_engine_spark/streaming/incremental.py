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
        if batch_df.isEmpty():
            return
        seg = os.path.join(out, "segments", f"seg={epoch_id}")
        m = build_index(
            batch_df.sparkSession, batch_df, seg,
            shard_size=shard_size, n_groups=1, resume=False,
        )
        _record_segment(batch_df.sparkSession, out, int(epoch_id),
                        int(m["n_docs"]))

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(index_batch)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _record_segment(spark: SparkSession, out: str, seg: int, n_docs: int) -> None:
    """Append (seg, n_docs, doc_id_base) to the segment manifest. doc_id
    assignment restarts at 0 inside every segment, so the manifest's
    running base is what makes doc_ids globally unique for cross-segment
    readers (read_segmented_docs); per-segment postings stay segment-local
    until a compactor rewrites them. Idempotent per segment (a replayed
    micro-batch does not double-append)."""
    from pyspark.sql import functions as F

    man_path = os.path.join(out, "segments_manifest")
    base = 0
    if os.path.exists(man_path):
        prev = spark.read.parquet(man_path)
        if prev.filter(F.col("seg") == seg).count() > 0:
            return
        base = int(prev.agg(F.sum("n_docs")).first()[0] or 0)
    spark.createDataFrame(
        [(seg, n_docs, base)], "seg long, n_docs long, doc_id_base long"
    ).write.mode("append").parquet(man_path)


def read_segment_manifest(spark: SparkSession, out: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out, "segments_manifest"))


def read_segmented_docs(spark: SparkSession, out: str) -> DataFrame:
    """All segments' doc tables with GLOBALLY-unique doc_ids (segment-local
    id + the manifest's running base)."""
    from pyspark.sql import functions as F

    base = os.path.join(out, "segments")
    docs = spark.read.option("basePath", base).parquet(
        os.path.join(base, "seg=*", "docs")
    )
    man = read_segment_manifest(spark, out)
    return (
        docs.join(F.broadcast(man.select("seg", "doc_id_base")), "seg")
        .withColumn("doc_id", F.col("doc_id") + F.col("doc_id_base"))
        .drop("doc_id_base")
    )


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
