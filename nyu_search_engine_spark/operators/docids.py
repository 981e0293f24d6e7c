"""Dense docID assignment (SURVEY.md §2.4 A6).

Reference locus: inverted-index/main:parser assigns docID++ in sequential
parse order (/root/reference/README.md:6). A distributed engine has no
"parse order", so the pinned total order (§8.4) is ascending
(repo, path, commit) bytes — unique by construction.

Scalable two-pass plan (no single-partition window, no collect of data):
  1. repartitionByRange(sort_keys) + sortWithinPartitions  -> global order
     split across P range-ordered partitions            [the only shuffle]
  2. per-partition row counts -> driver prefix-sum (P integers)
  3. pure-JVM projection adds base offset + partition-local record number
     (monotonically_increasing_id low 33 bits) — zero Python, the corpus
     content never crosses the Arrow boundary

The result is partitioning-invariant: doc_id == global rank in the total
order no matter where the range boundaries fall (local[1] == local[32]).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import DOC_SORT_KEYS


@dataclass
class DocIdAssignment:
    """Explicit result of docID assignment (no attribute smuggling: any
    wrapper around the DataFrame would silently drop ad-hoc attrs)."""

    df: DataFrame          # input columns + doc_id (+ optional pid col)
    n_docs: int            # corpus count, free from the prefix-sum pass
    ranged_cache: DataFrame  # persisted intermediate; caller unpersists
    counts: dict[int, int]   # per-range-partition row counts
    offsets: dict[int, int]  # per-partition first doc_id (prefix sums)

    @property
    def shard_bounds(self) -> list[list[int]]:
        """[[pid, max_doc_id], ...] for non-empty partitions, ascending.

        Because ids are assigned densely in partition order, partition p
        holds exactly [offsets[p], offsets[p]+counts[p]-1] — the builder's
        fast-mode shard bounds come free from the prefix-sum pass (no
        extra job over the tokenized cache)."""
        return [
            [pid, self.offsets[pid] + self.counts[pid] - 1]
            for pid in sorted(self.counts)
            if self.counts[pid] > 0
        ]


def assign_doc_ids(
    df: DataFrame,
    sort_keys: tuple[str, ...] = DOC_SORT_KEYS,
    num_partitions: int | None = None,
    keep_pid_col: str | None = None,
) -> DataFrame:
    """Convenience wrapper returning only the DataFrame (see
    ``assign_doc_ids_full`` for the count + cache handle)."""
    return assign_doc_ids_full(df, sort_keys, num_partitions, keep_pid_col).df


def assign_doc_ids_full(
    df: DataFrame,
    sort_keys: tuple[str, ...] = DOC_SORT_KEYS,
    num_partitions: int | None = None,
    keep_pid_col: str | None = None,
    storage_level=None,
) -> DocIdAssignment:
    """Add a dense ``doc_id`` column: 0..N-1 by ascending sort_keys.

    With ``keep_pid_col``, also emit the range-partition index as a column.
    Because partitions are ordered key ranges and ids are assigned in
    order, each partition holds a CONTIGUOUS doc_id range — the builder
    uses the partition index directly as the index shard, which removes
    the postings shuffle entirely (SHUFFLE 2 becomes a partition-local
    sort).
    """
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(p, *sort_keys)
        .sortWithinPartitions(*sort_keys)
        .withColumn("_pid", F.spark_partition_id())
    )
    # storage_level lets the caller make the fits-in-memory decision
    # (build_index estimates it from the corpus input bytes); the cache
    # holds the full content column, so an over-memory corpus should go
    # straight to disk instead of eviction/re-promotion churn
    ranged.persist(storage_level) if storage_level is not None \
        else ranged.persist()
    try:
        counts = {r["_pid"]: r["count"] for r in ranged.groupBy("_pid").count().collect()}
        offsets: dict[int, int] = {}
        acc = 0
        for pid in range(max(counts, default=-1) + 1):
            offsets[pid] = acc
            acc += counts.get(pid, 0)

        # Pure-JVM id attach (the former mapInPandas round-tripped the
        # ENTIRE corpus — content column included — through
        # Arrow->pandas->Arrow just to add an integer column; at the wide
        # parallelism level that serialization is pure memory-bandwidth
        # tax). monotonically_increasing_id() is documented as
        # (partition_id << 33) | partition-local record number, and rows
        # stream in sorted order (sortWithinPartitions over UNIQUE keys is
        # order-deterministic), so
        #   doc_id = offsets[pid] + (mid & (2^33 - 1))
        # reproduces the dense global rank exactly (test_docids asserts
        # parallelism invariance + golden ids).
        offs_arr = F.array(*[F.lit(int(offsets.get(i, 0))) for i in range(p)])
        local_idx = F.monotonically_increasing_id().bitwiseAND(
            F.lit((1 << 33) - 1)
        )
        cols = [f.name for f in df.schema.fields]
        out = ranged.withColumn(
            "doc_id",
            (F.element_at(offs_arr, F.col("_pid") + 1) + local_idx)
            .cast("long"),
        ).select(
            *cols, "doc_id",
            *([F.col("_pid").cast("int").alias(keep_pid_col)]
              if keep_pid_col else []),
        )
        # ranged stays persisted: the caller unpersists it once downstream
        # frames are materialized (unpersisting `out` would NOT release it).
        # n_docs comes free from the prefix-sum pass (no extra job).
        return DocIdAssignment(df=out, n_docs=acc, ranged_cache=ranged,
                               counts=counts, offsets=offsets)
    except Exception:
        ranged.unpersist()
        raise
