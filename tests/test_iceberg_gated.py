"""Gated Iceberg round-trip test (VERDICT r3 "Next round" #8).

The input_hint names Iceberg as the corpus table format; this sandbox
image ships no ``iceberg-spark-runtime`` jar, so ``sources/corpus.py``'s
Iceberg branch is normally untestable dead code. This test activates
itself the day the environment grows the jar (drop
``iceberg-spark-runtime-<spark-ver>_<scala-ver>-<ver>.jar`` into
``$SPARK_HOME/jars``): it writes a small corpus as an Iceberg table in a
local hadoop catalog, reads it back through ``load_corpus(fmt="iceberg")``,
and asserts the scan is row-identical to the parquet path over the same
rows — i.e. the two branches of the format seam agree.

Skipped (not passed) when the jar is absent, so the suite's green count
never silently includes an untested branch.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest

_JAR_GLOBS = [
    os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "jars",
                 "iceberg-spark-runtime*.jar"),
    "/opt/spark/jars/iceberg-spark-runtime*.jar",
]
_ICEBERG_JARS = sorted({j for g in _JAR_GLOBS for j in glob.glob(g)})

pytestmark = pytest.mark.skipif(
    not _ICEBERG_JARS,
    reason="no iceberg-spark-runtime jar on the Spark classpath "
    "(environment limitation — see sources/corpus.py docstring)",
)


@pytest.fixture(scope="module")
def iceberg_spark():
    # own session: the Iceberg catalog + SQL extensions must be set at
    # session build time, so the shared conftest session cannot be reused
    from pyspark.sql import SparkSession

    warehouse = tempfile.mkdtemp(prefix="nyu_iceberg_wh_")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-gated-test")
        .config("spark.sql.shuffle.partitions", "8")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        yield spark
    finally:
        spark.stop()
        shutil.rmtree(warehouse, ignore_errors=True)


def test_iceberg_corpus_scan_matches_parquet(iceberg_spark):
    from nyu_search_engine_spark.sources.corpus import CORPUS_COLS, load_corpus
    from nyu_search_engine_spark.synth import synth_corpus

    spark = iceberg_spark
    corpus = synth_corpus(spark, 500)
    corpus.writeTo("local.db.corpus_gated").using("iceberg").createOrReplace()

    via_iceberg = load_corpus(spark, "local.db.corpus_gated", fmt="iceberg")
    assert [f for f in via_iceberg.columns] == CORPUS_COLS

    with tempfile.TemporaryDirectory(prefix="nyu_iceberg_pq_") as pq:
        path = os.path.join(pq, "corpus")
        corpus.write.parquet(path)
        via_parquet = load_corpus(spark, path, fmt="parquet")
        # order-insensitive row identity between the two format branches
        assert via_iceberg.exceptAll(via_parquet).count() == 0
        assert via_parquet.exceptAll(via_iceberg).count() == 0


def test_iceberg_build_and_query_parity(iceberg_spark, tmp_path):
    """A tiny index built FROM the Iceberg scan is byte-identical to one
    built from the same rows via parquet (format must not leak into the
    index)."""
    from nyu_search_engine_spark.plans.build_index import build_index
    from nyu_search_engine_spark.sources.corpus import load_corpus
    from nyu_search_engine_spark.synth import synth_corpus

    spark = iceberg_spark
    corpus = synth_corpus(spark, 300)
    corpus.writeTo("local.db.corpus_parity").using("iceberg").createOrReplace()
    pq_dir = str(tmp_path / "pq_corpus")
    corpus.write.parquet(pq_dir)

    ice_idx = str(tmp_path / "idx_ice")
    pq_idx = str(tmp_path / "idx_pq")
    build_index(spark, load_corpus(spark, "local.db.corpus_parity",
                                   fmt="iceberg"),
                ice_idx, n_groups=1, resume=False, cache_input=False)
    build_index(spark, load_corpus(spark, pq_dir, fmt="parquet"),
                pq_idx, n_groups=1, resume=False, cache_input=False)

    ice_post = spark.read.parquet(os.path.join(ice_idx, "postings"))
    pq_post = spark.read.parquet(os.path.join(pq_idx, "postings"))
    assert ice_post.exceptAll(pq_post).count() == 0
    assert pq_post.exceptAll(ice_post).count() == 0
