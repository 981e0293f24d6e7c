"""Per-row content sha256 invariant vs the source table
(BASELINE.json north_star/input_hint; SURVEY.md §5.2 test_sha256)."""

import hashlib

from pyspark.sql import functions as F

from nyu_search_engine_spark.sources import index_io


def test_sha256_matches_source(spark, corpus, index_root):
    docs = index_io.read_docs(spark, index_root)
    src = corpus.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("src_sha")
    )
    joined = docs.join(src, ["repo", "path", "commit"], "full_outer")
    bad = joined.filter(
        F.col("sha256").isNull()
        | F.col("src_sha").isNull()
        | (F.col("sha256") != F.col("src_sha"))
    ).count()
    assert bad == 0


def test_sha256_is_real_sha256(spark, index_root, corpus_pdf):
    docs = index_io.read_docs(spark, index_root).toPandas()
    key = docs["repo"] + "|" + docs["path"] + "|" + docs["commit"]
    got = dict(zip(key, docs["sha256"]))
    r = corpus_pdf.iloc[0]
    k = f"{r['repo']}|{r['path']}|{r['commit']}"
    assert got[k] == hashlib.sha256(r["content"].encode()).hexdigest()
