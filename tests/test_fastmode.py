"""Partition-as-shard (fast) build mode: zero postings shuffle. Results
must be rank-identical to the explicit-shard-size (legacy) build, and the
layout invariants must hold (one row per (shard, term), contiguous
doc-range shards)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nyu_search_engine_spark.plans.build_index import build_index
from nyu_search_engine_spark.plans.search import Query
from nyu_search_engine_spark.plans.search_index import IndexSearcher
from nyu_search_engine_spark.sources import index_io


@pytest.fixture(scope="module")
def fast_root(spark, corpus):
    root = tempfile.mkdtemp(prefix="idx_fast_")
    m = build_index(spark, corpus, root, shard_size=None, n_groups=2)
    assert m["fast_mode"] is True
    yield root
    shutil.rmtree(root, ignore_errors=True)


QUERIES = [
    Query(("rareterm00", "rareterm01"), "AND"),
    Query(("hotterm0", "rareterm07"), "OR"),
    Query(("def", "return", "class"), "OR"),
]


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: f"{q.mode}-{q.terms[0]}")
def test_fast_mode_rank_identical_to_legacy(spark, fast_root, searcher, q):
    fast = IndexSearcher(spark, fast_root)
    a = [(r["rank"], r["doc_id"], r["score"])
         for r in fast.search(q, "pruned", decorate=False).collect()]
    b = [(r["rank"], r["doc_id"], r["score"])
         for r in searcher.search(q, "pruned", decorate=False).collect()]
    assert a == b


def test_fast_mode_layout_invariants(spark, fast_root):
    p = index_io.read_postings(spark, fast_root)
    # one row per (shard, term)
    dupes = p.groupBy("shard", "term").count().filter(F.col("count") > 1).count()
    assert dupes == 0
    # shards cover disjoint ordered doc ranges: every doc_id in shard s is
    # below every doc_id in shard s+1, so max(last) of s < min(last) of s+1
    spans = sorted(
        (r["shard"], r["lo"], r["hi"])
        for r in p.groupBy("shard").agg(
            F.min(F.expr("blocks[0].last_doc_id")).alias("lo"),
            F.max(F.expr("blocks[size(blocks)-1].last_doc_id")).alias("hi"),
        ).collect()
    )
    for (s1, _, hi1), (s2, lo2, _) in zip(spans, spans[1:]):
        assert s1 < s2
        assert hi1 < lo2  # disjoint ascending ranges (lo2 >= first doc of s2)


def test_jvm_and_arrow_tokenizers_build_identical_postings(spark, corpus):
    """The JVM (regexp-split + kernel run-collapse) and Arrow (fused
    tokenize+tf UDF) build paths must produce byte-identical postings."""
    ra = tempfile.mkdtemp(prefix="idx_tok_a_")
    rb = tempfile.mkdtemp(prefix="idx_tok_b_")
    try:
        build_index(spark, corpus, ra, shard_size=80, n_groups=2,
                    tokenizer="jvm")
        build_index(spark, corpus, rb, shard_size=80, n_groups=2,
                    tokenizer="arrow")

        def fp(root):
            return sorted(
                (r["shard"], r["term"], r["df"], r["cf"],
                 bytes(r["doc_ids_vb"]).hex(), bytes(r["tfs_vb"]).hex(),
                 bytes(r["doclens_vb"]).hex())
                for r in index_io.read_postings(spark, root).collect()
            )

        assert fp(ra) == fp(rb)
    finally:
        shutil.rmtree(ra, ignore_errors=True)
        shutil.rmtree(rb, ignore_errors=True)


def test_fast_mode_lexicon_matches_legacy(spark, fast_root, index_root):
    a = index_io.read_lexicon(spark, fast_root).select("term", "df", "cf")
    b = index_io.read_lexicon(spark, index_root).select("term", "df", "cf")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_uncached_input_build_byte_identical(spark, corpus, tmp_path):
    """cache_input=False (the parquet-scan corpus shape at 100 TB) must
    produce byte-identical postings to the cached-input build."""
    src = str(tmp_path / "corpus_pq")
    corpus.write.parquet(src)
    pq = spark.read.parquet(src)
    ra, rb = str(tmp_path / "cached"), str(tmp_path / "uncached")
    build_index(spark, corpus, ra, shard_size=90, n_groups=2,
                parallel_groups=False)
    build_index(spark, pq, rb, shard_size=90, n_groups=2,
                parallel_groups=False, cache_input=False)

    def fp(root):
        return sorted(
            (r["shard"], r["term"], r["df"], r["cf"],
             bytes(r["doc_ids_vb"]).hex(), bytes(r["tfs_vb"]).hex(),
             bytes(r["doclens_vb"]).hex())
            for r in index_io.read_postings(spark, root).collect()
        )

    assert fp(ra) == fp(rb)
