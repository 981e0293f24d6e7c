"""TREC ingester and Structured-Streaming incremental indexing."""

import os
import shutil
import tempfile

from nyu_search_engine_spark.sources.trec import read_trec

TREC_SAMPLE = """<DOC>
<DOCNO>D1</DOCNO>
<TEXT>
http://example.com/a
hello world of search engines
</TEXT>
</DOC>
<DOC>
<DOCNO>D2</DOCNO>
<TEXT>
http://example.com/b
second document body text
</TEXT>
</DOC>
"""


def test_read_trec(spark, tmp_path):
    p = tmp_path / "corpus.trec"
    p.write_text(TREC_SAMPLE)
    rows = {r["repo"]: r for r in read_trec(spark, str(p)).collect()}
    assert set(rows) == {"D1", "D2"}
    assert rows["D1"]["path"] == "http://example.com/a"
    assert "hello world" in rows["D1"]["content"]
    assert "second document" in rows["D2"]["content"]
    assert rows["D1"]["commit"] == "trec"


def test_incremental_index_stream(spark, corpus):
    from nyu_search_engine_spark.sources import index_io
    from nyu_search_engine_spark.streaming.incremental import (
        read_segmented_lexicon,
        start_incremental_index,
    )

    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    out = tempfile.mkdtemp(prefix="stream_idx_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        sample = corpus.limit(50)
        sample.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(sample.schema).parquet(src_dir)
        q = start_incremental_index(spark, stream, out, ckpt, shard_size=25)
        q.awaitTermination(120)
        segs = os.listdir(os.path.join(out, "segments"))
        assert segs
        lex = read_segmented_lexicon(spark, out)
        batch_lex = index_io.read_lexicon(
            spark, os.path.join(out, "segments", segs[0])
        )
        # single micro-batch: merged view == the segment's own lexicon
        assert lex.count() == batch_lex.count()
        assert lex.filter("df <= 0").count() == 0
        # global doc_ids: manifest base offsets make them unique & dense
        from nyu_search_engine_spark.streaming.incremental import (
            read_segment_manifest,
            read_segmented_docs,
        )
        man = {r["seg"]: r for r in read_segment_manifest(spark, out).collect()}
        assert sum(r["n_docs"] for r in man.values()) == 50
        gdocs = read_segmented_docs(spark, out)
        ids = sorted(r["doc_id"] for r in gdocs.select("doc_id").collect())
        assert ids == list(range(50))
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_compact_segments_queryable(spark, corpus):
    """Multi-micro-batch stream -> compact -> one standard index whose
    pruned BM25 results match bruteforce over the same docs (global
    doc_ids, re-keyed shards, block maxes against GLOBAL avgdl)."""
    from nyu_search_engine_spark.plans.search import Query, bruteforce_topk
    from nyu_search_engine_spark.plans.search_index import IndexSearcher
    from nyu_search_engine_spark.streaming.incremental import (
        compact_segments,
        start_incremental_index,
    )

    src_dir = tempfile.mkdtemp(prefix="cstream_src_")
    out = tempfile.mkdtemp(prefix="cstream_idx_")
    ckpt = tempfile.mkdtemp(prefix="cstream_ckpt_")
    dest = tempfile.mkdtemp(prefix="cstream_dest_")
    try:
        sample = corpus.limit(60).persist()
        sample.count()
        sample.repartition(4).write.mode("overwrite").parquet(src_dir)
        stream = (
            spark.readStream.schema(sample.schema)
            .option("maxFilesPerTrigger", 2)  # force >= 2 micro-batches
            .parquet(src_dir)
        )
        q = start_incremental_index(spark, stream, out, ckpt, shard_size=25)
        q.awaitTermination(180)
        segs = os.listdir(os.path.join(out, "segments"))
        assert len(segs) >= 2, f"expected multiple segments, got {segs}"

        m = compact_segments(spark, out, dest)
        assert m["n_docs"] == 60 and m["n_segments"] == len(segs)

        searcher = IndexSearcher(spark, dest)
        # pick terms with mid-range df: in a 60-doc sample the planted hot
        # terms exceed df > N/2, flooring RSJ idf to 0 (all scores tie and
        # the tie-break depends on doc_id ordering, which compaction
        # legitimately permutes) — discriminative terms avoid that
        from pyspark.sql import functions as F

        from nyu_search_engine_spark.functions.tokenize import tokens_col

        dfs = (
            sample.select(
                "path", F.explode(tokens_col(F.col("content"))).alias("t")
            )
            .distinct()
            .groupBy("t")
            .count()
            .filter((F.col("count") >= 5) & (F.col("count") <= 20))
            .orderBy("t")
            .limit(2)
            .collect()
        )
        t1, t2 = dfs[0]["t"], dfs[1]["t"]
        for qq in [Query((t1, t2), "OR", 10),
                   Query((t1,), "AND", 10)]:
            got = [
                (r["repo"], r["path"], round(r["score"], 9))
                for r in searcher.search(qq, "pruned").collect()
            ]
            want = [
                (r["repo"], r["path"], round(r["score"], 9))
                for r in bruteforce_topk(sample, qq).collect()
            ]
            assert got == want, qq
    finally:
        sample.unpersist()
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)


def test_load_corpus_format_seam(spark, corpus, tmp_path):
    """Explicit fmt= seam: parquet branch reads the input_hint shape;
    the iceberg branch fails cleanly without runtime jars (sandbox has
    none — README 'Iceberg'); auto mode falls back to parquet."""
    import pytest as _pytest

    from nyu_search_engine_spark.sources.corpus import CORPUS_COLS, load_corpus

    path = str(tmp_path / "corpus_pq")
    corpus.write.mode("overwrite").parquet(path)
    n = corpus.count()

    out = load_corpus(spark, path, fmt="parquet")
    assert out.columns == CORPUS_COLS and out.count() == n

    auto = load_corpus(spark, path)  # no jars -> parquet fallback
    assert auto.count() == n

    with _pytest.raises(Exception):
        load_corpus(spark, path, fmt="iceberg").collect()

    with _pytest.raises(ValueError):
        load_corpus(spark, path, fmt="orc-ish")
