"""Dense docID assignment (SURVEY.md §2.4 A6).

Reference locus: inverted-index/main:parser assigns docID++ in sequential
parse order (/root/reference/README.md:6). A distributed engine has no
"parse order", so the pinned total order (§8.4) is ascending
(repo, path, commit) bytes — unique by construction.

Scalable two-pass plan (no single-partition window, no collect of data):
  1. repartitionByRange(sort_keys) + sortWithinPartitions  -> global order
     split across P range-ordered partitions            [the only shuffle]
  2. per-partition row counts -> driver prefix-sum (P integers)
  3. mapInPandas adds partition base offset + running position

The result is partitioning-invariant: doc_id == global rank in the total
order no matter where the range boundaries fall (local[1] == local[32]).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
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
    ranged.persist()
    try:
        counts = {r["_pid"]: r["count"] for r in ranged.groupBy("_pid").count().collect()}
        offsets: dict[int, int] = {}
        acc = 0
        for pid in range(max(counts, default=-1) + 1):
            offsets[pid] = acc
            acc += counts.get(pid, 0)

        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        ) + ", doc_id long"
        cols = [f.name for f in df.schema.fields]
        if keep_pid_col:
            out_schema += f", {keep_pid_col} int"

        def add_ids(batches):
            pos = -1
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["_pid"].iloc[0])
                if pos < 0:
                    pos = offsets[pid]
                ids = np.arange(pos, pos + len(pdf), dtype=np.int64)
                pos += len(pdf)
                out = pdf[cols].assign(doc_id=ids)
                if keep_pid_col:
                    out[keep_pid_col] = np.int32(pid)
                yield out

        out = ranged.mapInPandas(add_ids, schema=out_schema)
        # ranged stays persisted: the caller unpersists it once downstream
        # frames are materialized (unpersisting `out` would NOT release it).
        # n_docs comes free from the prefix-sum pass (no extra job).
        return DocIdAssignment(df=out, n_docs=acc, ranged_cache=ranged)
    except Exception:
        ranged.unpersist()
        raise
