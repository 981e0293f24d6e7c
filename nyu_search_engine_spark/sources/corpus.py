"""Corpus sources (SURVEY.md §2.1 S1).

The engine's mandated input shape (BASELINE.json input_hint) is an
Iceberg/Parquet table (repo, path, commit, lang, content). The reference
instead parses a sequential ``.trec`` stream (inverted-index/main:parser,
/root/reference/README.md:6); a distributed TREC ingester is provided in
``sources/trec.py`` for parity, but the tabular reader below is the
primary scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLS = ["repo", "path", "commit", "lang", "content"]


def load_corpus(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Read a corpus table already in the input_hint shape.

    ``fmt``: "iceberg" | "parquet" | None (auto: Iceberg when a catalog +
    runtime jar are configured, plain Parquet otherwise). The sandbox
    image ships NO Iceberg jars, so the Iceberg branch is untestable
    here (README "Iceberg" section); both branches are the same columnar
    scan with pushdown + pruning semantics, and the explicit ``fmt``
    seam lets a jar-equipped environment drive the Iceberg path directly.
    """
    if fmt == "iceberg":
        return _load_iceberg(spark, path)
    if fmt == "parquet":
        return spark.read.parquet(path).select(*CORPUS_COLS)
    if fmt is not None:
        raise ValueError(f"unknown corpus format {fmt!r}")
    try:
        return _load_iceberg(spark, path)
    except Exception:
        return spark.read.parquet(path).select(*CORPUS_COLS)


def _load_iceberg(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("iceberg").load(path).select(*CORPUS_COLS)


def adapt_documents(docs: DataFrame) -> DataFrame:
    """Project the driver testdata ``documents`` table into corpus shape.

    Pure projection (FIXTURES.md §4): repo=source, path=str(doc_id),
    commit='v0', content=text. Keeps every oracle SQL-expressible over
    the same parquet.
    """
    return docs.select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("v0").alias("commit"),
        F.col("lang").alias("lang"),
        F.col("text").alias("content"),
    )


def load_documents_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return adapt_documents(spark.read.parquet(f"{sf_dir}/documents.parquet"))
