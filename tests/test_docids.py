"""Dense docID assignment A6: dense 0..N-1, ordered by (repo,path,commit),
invariant across parallelism (§8.4; SURVEY.md §5.2 test_docids)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from nyu_search_engine_spark.operators.docids import assign_doc_ids


def _collect_ids(df):
    return {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in df.select("repo", "path", "commit", "doc_id").collect()
    }


def test_dense_and_ordered(spark, corpus):
    out = assign_doc_ids(corpus)
    rows = out.select("doc_id", "repo", "path", "commit").orderBy("doc_id").collect()
    n = len(rows)
    assert [r["doc_id"] for r in rows] == list(range(n))
    keys = [(r["repo"], r["path"], r["commit"]) for r in rows]
    assert keys == sorted(keys)


def test_matches_window_oracle(spark, corpus):
    got = _collect_ids(assign_doc_ids(corpus))
    w = Window.orderBy("repo", "path", "commit")
    oracle = _collect_ids(
        corpus.withColumn("doc_id", F.row_number().over(w) - 1)
    )
    assert got == oracle


def test_partitioning_invariance(spark, corpus):
    one = _collect_ids(assign_doc_ids(corpus.coalesce(1), num_partitions=1))
    many = _collect_ids(assign_doc_ids(corpus.repartition(16), num_partitions=7))
    assert one == many
