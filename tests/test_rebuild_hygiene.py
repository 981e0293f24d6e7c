"""Rebuild-in-place hygiene (round-5 advice items on plans/build_index.py):

* driver-side stats writes reproduce mode('overwrite') — stale stats
  rows from a prior build / the old Spark write path cannot survive;
* resume=False clears stale manifest rows + postings group dirs (a
  declared-fresh build must not inherit bookkeeping);
* resuming a crashed resume=False fast-mode build raises instead of
  silently splitting docs across shards with fresh partition bounds;
* final metrics count the LATEST attempt per group only.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nyu_search_engine_spark.plans import build_index as bi
from nyu_search_engine_spark.sources.index_io import table_path
from nyu_search_engine_spark.constants import MANIFEST_DIR, POSTINGS_DIR, STATS_DIR


def _data_files(path):
    return sorted(
        f for f in os.listdir(path)
        if not f.startswith(("_", ".")) and not f.endswith(".crc")
    )


def test_driver_write_rows_overwrite_clears_stale_files(tmp_path):
    d = str(tmp_path / "stats")
    schema = pa.schema([("n_docs", pa.int64())])
    # stale file, e.g. from the old Spark write path (uuid part name)
    os.makedirs(d)
    pq.write_table(pa.table({"n_docs": [999]}, schema=schema),
                   os.path.join(d, "part-00000-deadbeef.snappy.parquet"))
    bi._driver_write_rows(d, "part-00000.parquet", {"n_docs": [7]}, schema,
                          overwrite=True)
    assert _data_files(d) == ["part-00000.parquet"]
    assert pq.read_table(os.path.join(d, "part-00000.parquet"))[
        "n_docs"].to_pylist() == [7]
    # append shape (manifest rows) keeps both files
    bi._driver_write_rows(d, "part-row2.parquet", {"n_docs": [8]}, schema)
    assert len(_data_files(d)) == 2


def test_rebuild_in_place_resume_false_is_clean(spark, corpus):
    root = tempfile.mkdtemp(prefix="nyu_idx_rebuild_")
    try:
        m1 = bi.build_index(spark, corpus, root, shard_size=80, n_groups=2,
                            resume=False)
        # second fresh build straight over the first: same metrics, no
        # inherited manifest rows, exactly one stats data file
        m2 = bi.build_index(spark, corpus, root, shard_size=80, n_groups=2,
                            resume=False)
        assert m2["n_postings"] == m1["n_postings"]
        assert m2["bytes_out"] == m1["bytes_out"]
        assert len(_data_files(table_path(root, STATS_DIR))) == 1
        man = bi._read_manifest_driver(table_path(root, MANIFEST_DIR))
        # one ok row per group — prior build's rows were cleared
        assert len(man) == 2
        assert sorted(man["group"]) == [0, 1]
        # a stale postings group dir from a WIDER prior layout must not
        # survive either: fake one, rebuild, assert gone
        stale = os.path.join(table_path(root, POSTINGS_DIR), "group=9")
        os.makedirs(stale, exist_ok=True)
        bi.build_index(spark, corpus, root, shard_size=80, n_groups=2,
                       resume=False)
        assert not os.path.exists(stale)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_resume_of_crashed_resume_false_fast_build_raises(spark, corpus):
    root = tempfile.mkdtemp(prefix="nyu_idx_unsafe_")
    try:
        bi.build_index(spark, corpus, root, shard_size=None, n_groups=2,
                       resume=False)
        # simulate the crash-midway state: one group's manifest row gone
        g1 = glob.glob(os.path.join(table_path(root, MANIFEST_DIR),
                                    "part-g1-*"))
        assert g1
        for f in g1:
            os.remove(f)
        with pytest.raises(RuntimeError, match="resume=False"):
            bi.build_index(spark, corpus, root, shard_size=None, n_groups=2,
                           resume=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_resume_true_noop_over_complete_resume_false_index_ok(spark, corpus):
    root = tempfile.mkdtemp(prefix="nyu_idx_noop_")
    try:
        m1 = bi.build_index(spark, corpus, root, shard_size=None, n_groups=2,
                            resume=False)
        m2 = bi.build_index(spark, corpus, root, shard_size=None, n_groups=2,
                            resume=True)  # complete index: legal no-op
        assert m2["n_postings"] == m1["n_postings"]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_metrics_use_latest_attempt_per_group(spark, corpus):
    root = tempfile.mkdtemp(prefix="nyu_idx_attempt_")
    try:
        m1 = bi.build_index(spark, corpus, root, shard_size=80, n_groups=2,
                            resume=False)
        # forge a stale lower-attempt duplicate row for group 0 with an
        # absurd posting count; the no-op resume recomputes final metrics
        # and must ignore it in favor of the newest attempt
        bi._driver_write_rows(
            table_path(root, MANIFEST_DIR), "part-g0-a0-stale.parquet",
            {"group": [0], "status": ["ok"], "n_terms": [1],
             "n_postings": [10**9], "bytes_out": [10**9], "wall_ms": [1],
             "attempt": [0]},
            bi._manifest_schema(),
        )
        m2 = bi.build_index(spark, corpus, root, shard_size=80, n_groups=2,
                            resume=True)
        assert m2["n_postings"] == m1["n_postings"]
        assert m2["bytes_out"] == m1["bytes_out"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
