"""Skew handling (BASELINE.json north_rule: "skewed hot terms split via
salted groupBy with post-merge"). In this engine the deterministic salt is
the doc-range shard: a hot term's postings are bounded per (shard, term)
row, and the lexicon's groupBy(term) is the post-merge. This suite proves
the split happens and that the merged stats equal the unsalted truth."""

import duckdb
from pyspark.sql import functions as F

from nyu_search_engine_spark.functions.tokenize import duckdb_tokens_cte
from nyu_search_engine_spark.sources import index_io
from nyu_search_engine_spark.synth import HOT_TERMS
from tests.conftest import SHARD_SIZE


def test_hot_terms_split_across_shards(spark, index_root):
    p = index_io.read_postings(spark, index_root)
    hot = p.filter(F.col("term").isin(HOT_TERMS))
    per_term = hot.groupBy("term").agg(
        F.count("*").alias("n_slices"), F.max("df").alias("max_slice_df")
    ).collect()
    assert per_term, "hot terms missing from postings"
    for r in per_term:
        assert r["n_slices"] > 1, f"{r['term']} not split across shards"
        assert r["max_slice_df"] <= SHARD_SIZE


def test_no_slice_exceeds_shard_bound(spark, index_root):
    p = index_io.read_postings(spark, index_root)
    assert p.filter(F.col("df") > SHARD_SIZE).count() == 0


def test_merged_df_equals_bruteforce(spark, index_root, corpus_pdf):
    lex = index_io.read_lexicon(spark, index_root)
    got = {
        r["term"]: (r["df"], r["cf"])
        for r in lex.filter(F.col("term").isin(HOT_TERMS)).collect()
    }
    con = duckdb.connect()
    con.register("c", corpus_pdf)
    cte = duckdb_tokens_cte("repo || '|' || path", "content", "c")
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"""WITH t AS ({cte})
            SELECT term, count(DISTINCT doc), count(*) FROM t
            WHERE term IN ({','.join(repr(h) for h in HOT_TERMS)})
            GROUP BY term"""
        ).fetchall()
    }
    assert got == want


def test_slice_docid_ranges_disjoint(spark, index_root):
    """Across shards a term's slices cover disjoint ascending ranges —
    the precondition for the cheap ordered post-merge."""
    p = index_io.read_postings(spark, index_root)
    rows = (
        p.filter(F.col("term") == HOT_TERMS[0])
        .select("shard", "blocks")
        .collect()
    )
    spans = sorted(
        (r["shard"] * SHARD_SIZE, r["blocks"][-1]["last_doc_id"]) for r in rows
    )
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2 or hi1 < lo2 + SHARD_SIZE  # ranges ordered
        assert hi1 < lo2 + SHARD_SIZE
