"""Index table IO (SURVEY.md §2.1 S2-S4): postings / lexicon / docs / stats
/ manifest as Parquet under one index root. Iceberg would slot in here when
a catalog is configured (the sandbox ships no Iceberg jars)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..constants import DOCS_DIR, LEXICON_DIR, MANIFEST_DIR, POSTINGS_DIR, STATS_DIR


def table_path(index_root: str, name: str) -> str:
    return os.path.join(index_root, name)


def read_postings(spark: SparkSession, index_root: str) -> DataFrame:
    return spark.read.parquet(table_path(index_root, POSTINGS_DIR))


def read_lexicon(spark: SparkSession, index_root: str) -> DataFrame:
    return spark.read.parquet(table_path(index_root, LEXICON_DIR))


def read_docs(spark: SparkSession, index_root: str) -> DataFrame:
    return spark.read.parquet(table_path(index_root, DOCS_DIR))


def read_stats(spark: SparkSession, index_root: str) -> dict:
    row = spark.read.parquet(table_path(index_root, STATS_DIR)).first()
    return row.asDict()


def read_manifest(spark: SparkSession, index_root: str) -> DataFrame:
    return spark.read.parquet(table_path(index_root, MANIFEST_DIR))
