"""Bytes-bounded auto partition sizing for the docID assignment shuffle.

The assignment partitioning is inherited by every cached intermediate and
(fast mode) the shard layout, so its per-partition BYTES must be bounded —
measured failure: fixed p=32 at 1M docs OOMed 3/4 local[2]/2g builds
(BENCH/SCALING_2_to_8_1M_r5v3.md appendix). These tests pin the sizing
rule; end-to-end invariance of results across partition counts is covered
by test_docids/test_fastmode.
"""

from __future__ import annotations

import math
import os

import pytest

from nyu_search_engine_spark.plans import build_index as bi


def test_in_memory_corpus_keeps_configured_parallelism(spark, corpus):
    # no input files -> size unknowable without a job -> configured p
    assert bi._auto_p_assign(spark, corpus, 8) == 8


def test_small_parquet_corpus_keeps_configured_parallelism(
        spark, corpus, tmp_path):
    path = str(tmp_path / "corpus_pq")
    corpus.write.parquet(path)
    df = spark.read.parquet(path)
    # a few hundred tiny docs is far below any 64 MB-range target
    assert bi._auto_p_assign(spark, df, 8) == 8


def test_oversized_blocks_raise_partition_count(
        spark, corpus, tmp_path, monkeypatch):
    path = str(tmp_path / "corpus_pq2")
    corpus.write.parquet(path)
    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")
    )
    # force the measured-failure regime: target far below the corpus size
    target = max(1, total // 5)
    monkeypatch.setattr(bi, "ASSIGN_PARTITION_TARGET_MAX_BYTES", target)
    got = bi._auto_p_assign(spark, df, 2)
    assert got == max(2, math.ceil(total / target))
    assert got > 2


def test_heap_divisor_caps_target(spark, corpus, tmp_path, monkeypatch):
    # with a huge divisor the per-heap cap (heap/divisor) becomes the
    # binding target, so p grows even though the 64 MB cap would not bind
    path = str(tmp_path / "corpus_pq3")
    corpus.write.parquet(path)
    df = spark.read.parquet(path)
    monkeypatch.setattr(bi, "ASSIGN_PARTITION_HEAP_DIVISOR", 1 << 40)
    got = bi._auto_p_assign(spark, df, 2)
    assert got > 2  # target clamps to >= 1 byte/partition floor rule


def test_env_override_wins_over_rule(spark, corpus, tmp_path, monkeypatch):
    """SPARK_GRAFT_ASSIGN_PARTITIONS replaces the auto rule entirely —
    the scaling proxy's work-parity knob (both levels must build the
    same partition/shard count to compare identical work)."""
    path = str(tmp_path / "corpus_pq_ovr")
    corpus.write.parquet(path)
    df = spark.read.parquet(path)
    monkeypatch.setenv("SPARK_GRAFT_ASSIGN_PARTITIONS", "58")
    assert bi._auto_p_assign(spark, df, 8) == 58
    assert bi._auto_p_assign(spark, corpus, 8) == 58  # in-memory too


def test_parse_mem_bytes():
    assert bi._parse_mem_bytes("2g") == 2 << 30
    assert bi._parse_mem_bytes("512m") == 512 << 20
    assert bi._parse_mem_bytes("1024") == 1024
    assert bi._parse_mem_bytes("3G") == 3 << 30
    assert bi._parse_mem_bytes("1gb") == 1 << 30


def test_build_records_auto_p_in_conf(spark, corpus, tmp_path, monkeypatch):
    """An actual build over a file-backed corpus under a tiny target uses
    the raised p (=> n_shards) and records it for resume."""
    import json

    pq = str(tmp_path / "corpus_pq4")
    corpus.limit(60).write.parquet(pq)
    df = spark.read.parquet(pq)
    monkeypatch.setattr(bi, "ASSIGN_PARTITION_TARGET_MAX_BYTES", 1 << 10)
    out = str(tmp_path / "idx")
    metrics = bi.build_index(spark, df, out, n_groups=1, resume=False,
                             cache_input=False)
    with open(os.path.join(out, "build_conf.json")) as fh:
        conf = json.load(fh)
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert conf["p_assign"] > shuffle_p
    assert metrics["n_shards"] == conf["p_assign"]


def test_cache_level_unknown_size_keeps_memory(spark, corpus):
    from pyspark import StorageLevel
    assert bi._cache_level(spark, None) == StorageLevel.MEMORY_AND_DISK


def test_cache_level_small_corpus_memory_backed(spark):
    from pyspark import StorageLevel
    # a few MB against a multi-GB test heap: fits
    assert bi._cache_level(spark, 4 << 20) == StorageLevel.MEMORY_AND_DISK


def test_cache_level_oversized_corpus_disk_only(spark):
    from pyspark import StorageLevel
    # 1 TB of input cannot fit any single-box pool
    assert bi._cache_level(spark, 1 << 40) == StorageLevel.DISK_ONLY


def test_build_metrics_record_cache_level(spark, corpus, tmp_path):
    out = str(tmp_path / "idx_lvl")
    m = bi.build_index(spark, corpus, out, n_groups=1, resume=False)
    assert "cache_level" in m
