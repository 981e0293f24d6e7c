"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``nyu_search_engine_spark``; this file is the
thin adapter. Operators without an oracle entry are approximate or
stubbed by design (ann_lsh_topk; multimodal fake-decode paths) and get the
driver's rows-only check — their exactness is covered by pytest against
in-repo oracles instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nyu_search_engine_spark.driver_queries import build_oracles, build_queries
from nyu_search_engine_spark.plans.search import Query


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the sharded BM25 index over the sf0.001 documents
    (adapted to the corpus shape) and run the pruned block-max-WAND path."""
    from nyu_search_engine_spark.driver_queries import _searcher

    searcher = _searcher(spark, "/root/testdata/sf0.001")
    return searcher.search(Query(("dup", "spark", "merge"), "OR", 10), method="pruned")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracles()
