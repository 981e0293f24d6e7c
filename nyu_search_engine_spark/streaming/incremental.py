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
from ..sources import fsio


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
    if fsio.exists(man_path):
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


def compact_segments(spark: SparkSession, out: str, dest: str) -> dict:
    """Merge every streamed segment into ONE standard index layout at
    ``dest`` (queryable by plans.search_index.IndexSearcher).

    * doc_ids are remapped to the global space (segment-local id + the
      manifest's running base) — postings payloads are decoded, offset,
      and re-encoded in one mapInPandas pass, NO shuffle (numpy work per
      (shard, term) row, never per posting in Python);
    * block-max bounds are recomputed against the GLOBAL avgdl (each
      segment encoded against its own avgdl; BM25 at query time needs
      corpus-wide stats, so admissible bounds must too);
    * shard ids are re-keyed per segment (running shard base) so shards
      keep disjoint ascending doc ranges;
    * docs / stats / lexicon are rebuilt from segment tables.
    """
    import json

    import numpy as np
    from pyspark.sql import functions as F

    from ..constants import DOCS_DIR, LEXICON_DIR, POSTINGS_DIR, STATS_DIR
    from ..functions.varbyte import vb_decode, vb_decode_docids_blocked
    from ..operators.assemble import POSTINGS_SCHEMA, _encode_group_slice
    from ..sources.index_io import table_path

    seg_base = os.path.join(out, "segments")
    man = read_segment_manifest(spark, out).collect()
    doc_base = {int(r["seg"]): int(r["doc_id_base"]) for r in man}

    # global stats across segments
    stats = spark.read.option("basePath", seg_base).parquet(
        os.path.join(seg_base, "seg=*", "stats")
    ).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("total_tokens"),
    ).first()
    n_docs = int(stats["n_docs"])
    total_tokens = int(stats["total_tokens"])
    avgdl = total_tokens / n_docs if n_docs else 0.0

    # per-segment postings reads (a glob over seg=*/postings/group=* mixes
    # k=v and plain dir levels and trips partition discovery) unioned with
    # an explicit seg column
    from functools import reduce

    post = reduce(
        DataFrame.unionByName,
        [
            spark.read.parquet(os.path.join(seg_base, f"seg={seg}", "postings"))
            .withColumn("seg", F.lit(seg))
            for seg in sorted(doc_base)
        ],
    )
    # running shard base per segment (ascending seg order == ascending
    # doc_id base order, so re-keyed shards keep disjoint doc ranges)
    per_seg = {
        int(r["seg"]): int(r["mx"]) + 1
        for r in post.groupBy("seg").agg(F.max("shard").alias("mx")).collect()
    }
    shard_base, acc = {}, 0
    for seg in sorted(per_seg):
        shard_base[seg] = acc
        acc += per_seg[seg]

    def remap(batches):
        # r6: per-slice decode (the payloads are variable-length blobs, so
        # that loop is inherent) but ONE vectorized multi-group encode per
        # Arrow batch — each input row is its own (shard, term) group
        # (segment shards are re-keyed to disjoint ranges, so no two rows
        # share a key) and rows are already doc_id-sorted within, which is
        # exactly the _encode_group_slice input contract. Replaces a
        # per-slice encode_term_postings call (20+ numpy ops + Python
        # block dicts per slice, the pre-r6 assembly shape).
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            idx = {n: i for i, n in enumerate(rb.schema.names)}
            segs = rb.column(idx["seg"]).to_numpy(zero_copy_only=False)
            shards = rb.column(idx["shard"]).to_numpy(zero_copy_only=False)
            ids_col = rb.column(idx["doc_ids_vb"])
            tfs_col = rb.column(idx["tfs_vb"])
            dls_col = rb.column(idx["doclens_vb"])
            ids_parts, tfs_parts, dls_parts, sizes = [], [], [], []
            new_shard = np.empty(rb.num_rows, dtype=np.int64)
            for i in range(rb.num_rows):
                seg = int(segs[i])
                ids = vb_decode_docids_blocked(
                    ids_col[i].as_py()).astype(np.int64) + doc_base[seg]
                ids_parts.append(ids)
                tfs_parts.append(
                    vb_decode(tfs_col[i].as_py()).astype(np.int64))
                dls_parts.append(
                    vb_decode(dls_col[i].as_py()).astype(np.int64))
                sizes.append(ids.size)
                new_shard[i] = shard_base[seg] + int(shards[i])
            gstarts = np.concatenate(
                ([0], np.cumsum(sizes)[:-1])).astype(np.int64)
            yield _encode_group_slice(
                np.repeat(new_shard, sizes),
                rb.column(idx["term"]),
                np.concatenate(ids_parts), np.concatenate(tfs_parts),
                np.concatenate(dls_parts), gstarts, avgdl,
            )

    compacted = post.select(
        "seg", "shard", "term", "doc_ids_vb", "tfs_vb", "doclens_vb"
    ).mapInArrow(remap, POSTINGS_SCHEMA)
    compacted.write.mode("overwrite").parquet(
        os.path.join(table_path(dest, POSTINGS_DIR), "group=0")
    )

    docs = read_segmented_docs(spark, out).drop("seg")
    docs.write.mode("overwrite").parquet(table_path(dest, DOCS_DIR))
    spark.createDataFrame(
        [(n_docs, avgdl, total_tokens)],
        "n_docs long, avgdl double, total_tokens long",
    ).write.mode("overwrite").parquet(table_path(dest, STATS_DIR))

    new_post = spark.read.parquet(table_path(dest, POSTINGS_DIR))
    new_post.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.count("*").alias("n_slices"),
        F.max("max_tfn").alias("max_tfn"),
    ).write.mode("overwrite").parquet(table_path(dest, LEXICON_DIR))

    metrics = {"n_docs": n_docs, "avgdl": avgdl, "n_segments": len(per_seg),
               "n_shards": acc}
    fsio.write_text(os.path.join(dest, "compact_meta.json"),
                    json.dumps(metrics))
    return metrics


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
