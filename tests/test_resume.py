"""Resumable build (BASELINE.json north_rule: "resumable from checkpoint
with per-partition lineage + metrics"): kill after group m of n, rerun,
byte-identical index; manifest shows the redone group's attempt bump."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nyu_search_engine_spark.plans import build_index as bi
from nyu_search_engine_spark.sources import index_io


def _postings_fingerprint(spark, root):
    df = index_io.read_postings(spark, root)
    return sorted(
        (
            r["shard"], r["term"], r["df"], r["cf"],
            bytes(r["doc_ids_vb"]).hex(), bytes(r["tfs_vb"]).hex(),
            bytes(r["doclens_vb"]).hex(),
        )
        for r in df.collect()
    )


def test_resume_after_partial_build(spark, corpus, monkeypatch):
    clean_root = tempfile.mkdtemp(prefix="idx_clean_")
    crash_root = tempfile.mkdtemp(prefix="idx_crash_")
    try:
        bi.build_index(spark, corpus, clean_root, shard_size=80, n_groups=3,
                       parallel_groups=False)

        # crash the build while writing group 2
        real_write = bi.assemble_postings

        calls = {"n": 0}

        def crashing(avgdl, *args, **kw):
            calls["n"] += 1
            if calls["n"] == 3:  # third group job
                raise RuntimeError("simulated crash before group 2")
            return real_write(avgdl, *args, **kw)

        monkeypatch.setattr(bi, "assemble_postings", crashing)
        with pytest.raises(RuntimeError, match="simulated crash"):
            bi.build_index(spark, corpus, crash_root, shard_size=80, n_groups=3,
                           parallel_groups=False)
        monkeypatch.setattr(bi, "assemble_postings", real_write)

        man = spark.read.parquet(os.path.join(crash_root, "manifest"))
        done_before = {r["group"] for r in man.select("group").collect()}
        assert done_before == {0, 1}

        # resume: only group 2 is rebuilt
        bi.build_index(spark, corpus, crash_root, shard_size=80, n_groups=3,
                       parallel_groups=False)
        man = spark.read.parquet(os.path.join(crash_root, "manifest"))
        rows = {r["group"]: r["attempt"] for r in man.collect()}
        assert set(rows) == {0, 1, 2}

        assert _postings_fingerprint(spark, crash_root) == _postings_fingerprint(
            spark, clean_root
        )
        lex_a = index_io.read_lexicon(spark, crash_root)
        lex_b = index_io.read_lexicon(spark, clean_root)
        assert lex_a.exceptAll(lex_b).count() == 0
        assert lex_b.exceptAll(lex_a).count() == 0
    finally:
        shutil.rmtree(clean_root, ignore_errors=True)
        shutil.rmtree(crash_root, ignore_errors=True)


def test_fast_mode_resume_uses_recorded_bounds(spark, corpus, monkeypatch):
    """Fast mode (partition-as-shard): range-partition boundaries come from
    reservoir sampling and are NOT reproducible across sessions, so a
    resumed build must derive shards from the doc_id bounds recorded in
    build_conf.json on the first run — groups kept from the first run and
    redone groups then agree on every boundary doc (byte-identical)."""
    import json

    clean_root = tempfile.mkdtemp(prefix="idx_fclean_")
    crash_root = tempfile.mkdtemp(prefix="idx_fcrash_")
    try:
        bi.build_index(spark, corpus, clean_root, shard_size=None, n_groups=2,
                       parallel_groups=False)

        real_write = bi.assemble_postings
        calls = {"n": 0}

        def crashing(avgdl, *args, **kw):
            calls["n"] += 1
            if calls["n"] == 2:  # second group job
                raise RuntimeError("simulated crash before group 1")
            return real_write(avgdl, *args, **kw)

        monkeypatch.setattr(bi, "assemble_postings", crashing)
        with pytest.raises(RuntimeError, match="simulated crash"):
            bi.build_index(spark, corpus, crash_root, shard_size=None,
                           n_groups=2, parallel_groups=False)
        monkeypatch.setattr(bi, "assemble_postings", real_write)

        # the first (crashed) run must have recorded the shard bounds
        with open(os.path.join(crash_root, "build_conf.json")) as fh:
            conf = json.load(fh)
        assert conf["shard_size"] is None
        assert conf["shard_bounds"], "fast mode must record doc_id bounds"

        bi.build_index(spark, corpus, crash_root, shard_size=None, n_groups=2,
                       parallel_groups=False)
        man = spark.read.parquet(os.path.join(crash_root, "manifest"))
        assert {r["group"] for r in man.collect()} == {0, 1}

        assert _postings_fingerprint(spark, crash_root) == _postings_fingerprint(
            spark, clean_root
        )
    finally:
        shutil.rmtree(clean_root, ignore_errors=True)
        shutil.rmtree(crash_root, ignore_errors=True)


def test_manifest_metrics_present(spark, index_root):
    man = index_io.read_manifest(spark, index_root)
    rows = man.filter(F.col("status") == "ok").collect()
    assert rows
    for r in rows:
        assert r["n_terms"] > 0
        assert r["n_postings"] > 0
        assert r["bytes_out"] > 0
        assert r["wall_ms"] >= 0
        assert r["attempt"] >= 1


def test_fast_mode_resume_512_shards(spark, corpus, monkeypatch):
    """Scale shape of the resume-bounds derivation (VERDICT r2 #6): with
    512 recorded shard bounds the per-row shard lookup is a vectorized
    binary search, not a 512-element literal-array scan — a resumed build
    at high shard counts must stay byte-identical AND fast."""
    import json
    import time

    old_p = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    clean_root = tempfile.mkdtemp(prefix="idx_512clean_")
    crash_root = tempfile.mkdtemp(prefix="idx_512crash_")
    try:
        bi.build_index(spark, corpus, clean_root, shard_size=None, n_groups=2,
                       parallel_groups=False)

        real_write = bi.assemble_postings
        calls = {"n": 0}

        def crashing(avgdl, *args, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated crash before group 1")
            return real_write(avgdl, *args, **kw)

        monkeypatch.setattr(bi, "assemble_postings", crashing)
        with pytest.raises(RuntimeError, match="simulated crash"):
            bi.build_index(spark, corpus, crash_root, shard_size=None,
                           n_groups=2, parallel_groups=False)
        monkeypatch.setattr(bi, "assemble_postings", real_write)

        with open(os.path.join(crash_root, "build_conf.json")) as fh:
            conf = json.load(fh)
        assert conf["p_assign"] == 512
        assert len(conf["shard_bounds"]) >= 256  # tiny corpus: most shards non-empty

        t0 = time.time()
        bi.build_index(spark, corpus, crash_root, shard_size=None, n_groups=2,
                       parallel_groups=False)
        resumed_s = time.time() - t0
        assert _postings_fingerprint(spark, crash_root) == _postings_fingerprint(
            spark, clean_root
        )
        assert resumed_s < 120  # seconds, 300-doc corpus: resume must not blow up
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_p)
        shutil.rmtree(clean_root, ignore_errors=True)
        shutil.rmtree(crash_root, ignore_errors=True)
