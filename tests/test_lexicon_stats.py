"""Lexicon statistics vs a DuckDB brute-force oracle (BASELINE.json:
"lexicon statistics"; SURVEY.md §5.2 test_lexicon_stats)."""

import duckdb
from pyspark.sql import functions as F

from nyu_search_engine_spark.functions.tokenize import duckdb_tokens_cte
from nyu_search_engine_spark.sources import index_io


def _oracle(corpus_pdf):
    con = duckdb.connect()
    con.register("c", corpus_pdf)
    cte = duckdb_tokens_cte("repo || '|' || path || '|' || commit", "content", "c")
    df_cf = con.sql(
        f"""WITH t AS ({cte})
        SELECT term, count(DISTINCT doc) AS df, count(*) AS cf
        FROM t GROUP BY term"""
    ).df()
    stats = con.sql(
        f"""WITH t AS ({cte}), dl AS (SELECT doc, count(*) n FROM t GROUP BY doc)
        SELECT count(*) AS n_docs, avg(n) AS avgdl, sum(n) AS total FROM dl"""
    ).df()
    return df_cf, stats


def test_lexicon_df_cf(spark, index_root, corpus_pdf):
    lex = index_io.read_lexicon(spark, index_root).toPandas()
    oracle, _ = _oracle(corpus_pdf)
    got = lex.set_index("term")[["df", "cf"]].sort_index()
    want = oracle.set_index("term")[["df", "cf"]].sort_index()
    assert got.index.tolist() == want.index.tolist()
    assert (got["df"].to_numpy() == want["df"].to_numpy()).all()
    assert (got["cf"].to_numpy() == want["cf"].to_numpy()).all()


def test_corpus_stats(spark, index_root, corpus_pdf):
    stats = index_io.read_stats(spark, index_root)
    _, want = _oracle(corpus_pdf)
    assert stats["n_docs"] == int(want["n_docs"][0])
    assert abs(stats["avgdl"] - float(want["avgdl"][0])) < 1e-9
    assert stats["total_tokens"] == int(want["total"][0])


def test_doclen_matches(spark, index_root, corpus_pdf):
    import pandas as pd

    from nyu_search_engine_spark.functions.tokenize import tokenize_py

    docs = index_io.read_docs(spark, index_root).toPandas()
    key = docs["repo"] + "|" + docs["path"] + "|" + docs["commit"]
    got = dict(zip(key, docs["doclen"]))
    for _, r in corpus_pdf.iterrows():
        k = f"{r['repo']}|{r['path']}|{r['commit']}"
        assert got[k] == len(tokenize_py(r["content"]))
