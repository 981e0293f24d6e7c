"""Index build (SURVEY.md §3.1, entry point 1).

Reference trace (inverted-index/main, /root/reference/README.md:6): parse
.trec -> multithreaded tokenize -> memory-budgeted sorted temp runs ->
k-way heap merge -> compressed index + lexicon + doc table. Spark-first
re-expression:

  scan (Parquet/Iceberg, columnar)
   -> assign_doc_ids                       [SHUFFLE 1: range by (repo,path,commit)]
   -> tokenize_tf Arrow UDF (+ sha256)     [one JVM->Python pass, cached]
   -> docs + stats tables
   -> (repartition("shard") only when shard_size is explicit) [SHUFFLE 2:
      per-DOC list rows move, never exploded postings]
   -> assemble_postings mapInArrow: flatten + lexsort + vectorized encode
      per partition == the reference's temp-run sort + k-way merge
   -> postings table, written per contiguous shard GROUP (checkpoint unit)
   -> lexicon (tiny agg over assembled rows)     [SHUFFLE 3, rows ~ vocab]

Resumability (north_rule): each shard group is an idempotent job writing
postings/group=g plus a manifest row; a rerun skips groups already marked
ok and bumps `attempt` on the ones it redoes. Because docID assignment and
tokenization are deterministic and partitioning-invariant, a resumed build
is byte-identical to a clean one (test_resume).
"""

from __future__ import annotations

import json
import math
import os
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..constants import (
    DOCS_DIR,
    LEXICON_DIR,
    MANIFEST_DIR,
    POSTINGS_DIR,
    STATS_DIR,
)
from ..functions.tokenize import tokenize_tf_map, tokens_col, tokens_tf_cols
from ..operators.assemble import POSTINGS_SCHEMA, assemble_postings
from ..operators.docids import assign_doc_ids_full
from ..sources import fsio
from ..sources.index_io import table_path

MANIFEST_SCHEMA = (
    "group int, status string, n_terms long, n_postings long, "
    "bytes_out long, wall_ms long, attempt int"
)


def _exists(path: str) -> bool:
    return fsio.exists(os.path.join(path, "_SUCCESS"))


def _clear_data_files(path: str) -> None:
    """Remove non-underscore data files — Spark ``mode('overwrite')``
    semantics for driver-side writes. Rebuild-in-place over an index
    written by an earlier build (or the old Spark write path, whose
    part files carry a uuid) must not leave stale rows beside the new
    file: index_io.read_stats takes ``.first()`` over the directory, so
    a stale stats row would silently corrupt BM25 (wrong n_docs/avgdl).
    """
    if not fsio.isdir(path):
        return
    for f in fsio.listdir(path):
        if not f.startswith(("_", ".")):
            try:
                fsio.remove_file(os.path.join(path, f))
            except IsADirectoryError:
                pass


def _driver_write_rows(path: str, filename: str, columns: dict,
                       schema: "pa.Schema", overwrite: bool = False) -> None:
    """Write a handful of rows as one parquet file from the driver.

    The 1-row stats table and the per-group manifest rows used to go
    through ``spark.createDataFrame(...).write`` — a full Spark job
    launch (scheduler round-trip + task) per call, pure serial time in
    the build's critical path. pyarrow writes the identical bytes with
    no cluster interaction; Spark reads the directory exactly as before.

    ``overwrite=True`` reproduces ``mode('overwrite')``: pre-existing
    data files are removed first (the stats table is one logical row —
    appends would leave the reader a coin-flip). Manifest rows keep the
    append shape: each file is a distinct (group, attempt) record.
    """
    import pyarrow as pa

    fsio.makedirs(path)
    if overwrite:
        _clear_data_files(path)
    tbl = pa.table(columns, schema=schema)
    fsio.write_parquet(tbl, os.path.join(path, filename))
    fsio.write_text(os.path.join(path, "_SUCCESS"), "")


def _manifest_schema():
    import pyarrow as pa

    # mirrors MANIFEST_SCHEMA (Spark DDL) field-for-field so pyarrow- and
    # Spark-written manifest files coexist in one directory
    return pa.schema([
        ("group", pa.int32()), ("status", pa.string()),
        ("n_terms", pa.int64()), ("n_postings", pa.int64()),
        ("bytes_out", pa.int64()), ("wall_ms", pa.int64()),
        ("attempt", pa.int32()),
    ])


def _read_manifest_driver(manifest_path: str) -> "pd.DataFrame | None":
    """Driver-side manifest read (resume bookkeeping + final metrics).

    The manifest is O(n_groups) tiny rows on local disk; reading it with
    Spark costs a job launch per lookup. Skips _SUCCESS/_-prefixed files
    like Spark's parquet reader does.
    """
    if not fsio.isdir(manifest_path):
        return None
    files = [
        os.path.join(manifest_path, f)
        for f in sorted(fsio.listdir(manifest_path))
        if not f.startswith(("_", ".")) and not f.endswith(".crc")
    ]
    if not files:
        return None
    return pd.concat(
        [fsio.read_parquet(f).to_pandas() for f in files],
        ignore_index=True,
    )


class _PhaseClock:
    """Per-phase wall + host-CPU mix (scaling diagnosis: a phase whose
    wall time does NOT shrink with parallelism, or whose user% stays flat
    while threads were added, is the scaling bottleneck). Reads
    /proc/stat at phase boundaries — no Spark interaction, ~free."""

    def __init__(self) -> None:
        self.phases: dict[str, dict] = {}

    @staticmethod
    def _stat() -> list[int]:
        try:
            with open("/proc/stat") as fh:
                return list(map(int, fh.readline().split()[1:9]))
        except OSError:  # non-Linux fallback: wall only
            return []

    def start(self) -> tuple[float, list[int]]:
        return time.time(), self._stat()

    def stop(self, name: str, token: tuple[float, list[int]]) -> None:
        t0, s0 = token
        wall = time.time() - t0
        rec = {"wall_s": round(wall, 2)}
        s1 = self._stat()
        if s0 and s1:
            d = [b - a for a, b in zip(s0, s1)]
            tot = max(1, sum(d))
            rec["user_pct"] = round(100 * (d[0] + d[1]) / tot, 1)
            rec["sys_pct"] = round(100 * d[2] / tot, 1)
            rec["idle_pct"] = round(100 * (d[3] + d[4]) / tot, 1)
        self.phases[name] = rec


# Bytes-per-partition targets for the docID assignment shuffle (which
# fixes the partitioning of every downstream cached intermediate and, in
# fast mode, the index shard layout). INPUT (on-disk, compressed) bytes
# are the sizing proxy; in-memory cached blocks run ~2-3x that.
#
# 32 MB, not Spark's 128 MB scan default, for two measured reasons:
# (a) load balance — at 1M docs the 32 MB target (58 partitions) ran the
#     local[8] build 12-25% faster than the 64 MB one (32 partitions):
#     7+ waves absorb the explode/sort/assemble per-partition variance
#     that 4 waves expose as tail idle (thread util 81-84% vs 64-70%;
#     BENCH/SCALING_2_to_8_1M_r5parity.md vs CACHE_COMPRESS_AB_1M.md
#     same-config OFF arms);
# (b) measurement/cluster fidelity — with the cap below heap/64 for all
#     heaps >= 2 GB, the partition count depends only on corpus bytes,
#     not executor memory, so two cluster sizes build identical
#     partition/shard layouts (the heap-coupled 64 MB rule made the
#     scaling pair compare 58- vs 32-shard builds).
ASSIGN_PARTITION_TARGET_MAX_BYTES = 32 << 20  # maxPartitionBytes-style cap
ASSIGN_PARTITION_HEAP_DIVISOR = 64  # target also <= executor_heap/64


def _parse_mem_bytes(s: str) -> int:
    s = s.strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] == "b":
        s = s[:-1]
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def _corpus_input_bytes(corpus: DataFrame) -> int | None:
    """Total on-disk bytes of the corpus scan's files (zero Spark jobs),
    or None when unknowable driver-side (in-memory frame, remote FS)."""
    try:
        files = corpus.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        if uri.startswith("file:"):
            path = uri[5:]
            while path.startswith("//"):  # file:///p -> /p
                path = path[1:]
        elif uri.startswith("/"):
            path = uri
        else:  # remote FS: sizing needs a FS call
            return None
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return total if total > 0 else None


def _executor_heap_bytes(spark: SparkSession) -> int:
    master = spark.sparkContext.master or ""
    if master.startswith("local"):
        return int(spark.sparkContext._jvm.java.lang.Runtime
                   .getRuntime().maxMemory())
    return _parse_mem_bytes(spark.conf.get("spark.executor.memory", "1g"))


# In-memory bytes per on-disk (snappy parquet) input byte for the build's
# cached intermediates — deserialized code-text rows and tokenized
# term/tf arrays both land in the 2-4x range; 3 is the sizing midpoint.
CACHE_INMEM_FACTOR = 3
# Cache to memory only when the whole intermediate plausibly fits in this
# fraction of the cluster storage pool; beyond it, MEMORY_AND_DISK is
# pure churn (evictions while writing, whole-block ByteBuffer
# re-promotions while reading — the measured 2g OOM site) and DISK_ONLY
# (write once, stream once) is strictly cheaper.
CACHE_FIT_FRACTION = 0.6


def _cache_level(spark: SparkSession, input_bytes: int | None):
    """MEMORY_AND_DISK when the estimated intermediate fits the storage
    pool, DISK_ONLY when it cannot — the executor-memory-aware choice
    Spark does not make by itself. Unknown size keeps MEMORY_AND_DISK
    (status quo; the caller controls in-memory corpora).

    The pool estimate is per-executor unified storage
    (``0.6 x (heap - 300MB)``) times the executor count (1 in local
    mode; ``spark.executor.instances`` else, defaulting to 1 —
    conservative: under-estimating the pool only ever picks DISK_ONLY,
    which degrades gracefully)."""
    from pyspark import StorageLevel

    if input_bytes is None:
        return StorageLevel.MEMORY_AND_DISK
    heap = _executor_heap_bytes(spark)
    pool = 0.6 * max(0, heap - (300 << 20))
    master = spark.sparkContext.master or ""
    if not master.startswith("local"):
        pool *= max(1, int(spark.conf.get("spark.executor.instances", "1")))
    if input_bytes * CACHE_INMEM_FACTOR <= CACHE_FIT_FRACTION * pool:
        return StorageLevel.MEMORY_AND_DISK
    return StorageLevel.DISK_ONLY


def _auto_p_assign(spark: SparkSession, corpus: DataFrame,
                   shuffle_p: int) -> int:
    """Partition count for the docID range shuffle: bound BYTES per
    partition, don't inherit a config constant blindly.

    Why: the assignment partitioning is inherited by the ranged/tokenized
    caches, and Spark re-promotes a disk-spilled serialized cached block
    with ONE ByteBuffer allocation of the whole block
    (``BlockManager.maybeCacheDiskBytesInMemory``) — so per-block bytes
    must stay small relative to the executor heap or a small-memory
    executor dies on allocation instead of streaming from disk. Measured:
    the 1M-doc corpus (1.8 GB parquet) at the fixed p=32 (~56 MB
    input/partition) OOMed 3 of 4 local[2]/2g builds while 500k at the
    same p was only intermittently fatal
    (BENCH/SCALING_2_to_8_1M_r5v3.md appendix — fix direction registered
    there before this change).

    Rule: target ``min(32 MB, executor_heap/64)`` input bytes per
    partition, floored at ``spark.sql.shuffle.partitions`` (the 32 MB
    cap's measured rationale is at ASSIGN_PARTITION_TARGET_MAX_BYTES).
    The corpus size comes from the scan's file sizes (zero Spark jobs);
    in-memory / non-local-file corpora keep the configured parallelism
    (their size is unknowable without a job — the caller controls those
    cases). At the 100 TB target the count then scales with data
    (≈ bytes/32 MB ranges) instead of a session constant, matching
    maxPartitionBytes-style scan sizing on a real cluster — and, because
    the cap binds below heap/64 for any ≥ 2 GB executor, the count is
    independent of cluster size, so scaling comparisons build identical
    layouts.

    ``SPARK_GRAFT_ASSIGN_PARTITIONS`` overrides the whole rule with an
    explicit count. Two uses: an operator who knows the corpus, and
    measurement WORK PARITY in the scaling proxy — the heap term makes
    the auto count depend on executor memory, and the scaling protocol
    scales heap with the core count (1 g/core), so the two cluster-size
    levels otherwise build different partition/shard counts (58 vs 32 at
    1M docs, BENCH/SCALING_2_to_8_1M_r5postfix.md) and the pair compares
    non-identical work. On a real cluster per-executor heap is fixed and
    the auto count is already cluster-size-independent.
    """
    override = os.environ.get("SPARK_GRAFT_ASSIGN_PARTITIONS")
    if override:
        return max(1, int(override))
    total = _corpus_input_bytes(corpus)
    if total is None:
        return shuffle_p
    heap = _executor_heap_bytes(spark)
    target = min(ASSIGN_PARTITION_TARGET_MAX_BYTES,
                 max(1, heap // ASSIGN_PARTITION_HEAP_DIVISOR))
    return max(shuffle_p, math.ceil(total / target))


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out: str,
    shard_size: int | None = None,
    n_groups: int = 4,
    resume: bool = True,
    parallel_groups: bool = True,
    tokenizer: str = "auto",
    cache_input: bool = True,
) -> dict:
    """Build the full index under ``out``. Returns build metrics.

    ``out`` may be a driver-local path or a URI (``hdfs://``, ``s3a://``,
    ``file://``): the resume bookkeeping (build_conf.json, manifest rows,
    stats) is written/read driver-side — zero job launches in the
    critical path — through ``sources/fsio.py``, which routes URI roots
    via ``pyarrow.fs`` and keeps plain paths on the ``os`` fast path.
    The bulk data writes go through Spark's Hadoop FS layer as always.

    shard_size=None selects partition-as-shard FAST MODE: dense docID
    assignment leaves each range partition holding a contiguous doc_id
    interval, the partition index becomes the index shard, and the
    postings stage runs with NO shuffle (partition-local sort + assembly).
    The per-shard max doc_id bounds are recorded in build_conf.json on the
    first run; a resumed fast-mode build derives shards FROM those bounds
    (range-sampled partition boundaries are not reproducible across
    sessions), trading the zero-shuffle property for byte-identical
    resume. An explicit shard_size keeps shard = doc_id // shard_size
    (one hash shuffle, resume-stable by construction).

    Passes over the tokenized cache (the expensive intermediate): corpus
    stats ride the docs write via Observation (zero extra passes), the
    shard-bounds pass runs only when ``resume=True`` (bounds exist solely
    for resumed sessions — a resume=False build is NOT resumable and a
    crashed one must be rerun with resume=False), and each shard-group
    job re-reads the cache once. n_groups is therefore the
    checkpoint-granularity / throughput dial: n_groups=1 consumes the
    cache exactly once after the docs write (still resumable at
    stage granularity via _SUCCESS markers + the manifest).
    """
    t0 = time.time()
    metrics: dict = {"n_groups": n_groups}
    clock = _PhaseClock()

    docs_path = table_path(out, DOCS_DIR)
    stats_path = table_path(out, STATS_DIR)
    manifest_path = table_path(out, MANIFEST_DIR)
    lexicon_path = table_path(out, LEXICON_DIR)

    # The corpus is read twice (range-sampling pass, id shuffle). Caching
    # it pays off when the input is expensive to recompute (synthesized /
    # transformed upstream); for a corpus that is ALREADY a columnar scan
    # (parquet/Iceberg — the 100 TB shape) pass cache_input=False: two
    # column-pruned scans are cheaper than holding the content column on
    # the executor heaps.
    # one storage-level decision governs every cached intermediate of
    # this build: memory-backed only if the estimate fits the pool
    cache_lvl = _cache_level(spark, _corpus_input_bytes(corpus))
    metrics["cache_level"] = str(cache_lvl)
    corpus_cached = corpus.persist(cache_lvl) if cache_input else corpus

    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # pin layout decisions across resume runs even if the session conf
    # changed: the first run writes build_conf.json
    conf_path = os.path.join(out, "build_conf.json")
    p_assign = _auto_p_assign(spark, corpus, shuffle_p)
    shard_bounds: list[list[int]] | None = None  # [[shard, max_doc_id]...]
    resuming = resume and fsio.exists(conf_path)
    if resuming:
        prior = json.loads(fsio.read_text(conf_path))
        shard_size = prior["shard_size"]  # None => partition-as-shard mode
        p_assign = prior["p_assign"]
        shard_bounds = prior.get("shard_bounds")
    fsio.makedirs(out)

    def _write_conf() -> None:
        fsio.write_text(conf_path, json.dumps(
            {"shard_size": shard_size, "n_groups": n_groups,
             "p_assign": p_assign, "shard_bounds": shard_bounds}))

    _write_conf()
    fast_mode = shard_size is None
    if not resume:
        # a resume=False build is declared FRESH: stale manifest rows
        # (which would inflate the final metrics and mark groups "done"
        # for a LATER resume) and stale postings group dirs (group=g for
        # g >= the new n_groups would leak into the basePath read) from
        # any prior build in the same out dir are cleared up front —
        # overwrite semantics at build granularity.
        _clear_data_files(manifest_path)
        fsio.rmtree(table_path(out, POSTINGS_DIR))
    # fast-mode resume: partition boundaries from a fresh session need not
    # match the first run's, so shards must come from the RECORDED bounds
    use_recorded_bounds = fast_mode and resuming and bool(shard_bounds)

    # --- docs + stats stage (checkpoint: _SUCCESS markers) -------------------
    # partition-as-shard (fast_mode): each assignment range partition holds
    # a contiguous doc_id range, so it IS the index shard — the postings
    # stage then needs NO shuffle at all (sort + assemble are
    # partition-local); the reference's temp-run merge happens inside the
    # per-partition ExternalSorter.
    tk = clock.start()
    assignment = assign_doc_ids_full(corpus_cached, num_partitions=p_assign,
                                     keep_pid_col="shard" if fast_mode else None,
                                     storage_level=cache_lvl)
    clock.stop("assign", tk)  # range shuffle + cache + prefix-sum collect
    assigned = assignment.df
    ranged_cache = assignment.ranged_cache
    # Tokenizer selection (measured — BENCH/TOKENIZER_AB_{100k,500k,1M}.md,
    # interleaved fresh-JVM trials on identical parquet input; all three
    # arms build byte-identical indexes, test_tokenizer.py):
    #   * "arrow" is since r6 the byte-level vectorized mapInArrow batch
    #     kernel (functions/tokenize.py tokenize_tf_batch) and wins at
    #     EVERY measured size: 1.9x jvm_tf at 500k docs (9.6k vs 5.1k
    #     docs/s) and ~2x at 1M (13-21k vs 7.8k) — the r5 crossover
    #     (where jvm_tf won past ~250k because the per-doc pandas UDF
    #     paid the Python loop + object-list return) no longer exists.
    #   * "jvm_tf" (pure column expressions, zero Python) stays as the
    #     explicit arm for Python-less deployments.
    #   * "jvm" (occurrence rows, tf counted in the assembly kernel) keeps
    #     a ~4x bigger tokenized cache (raw token streams) — it OOMed an
    #     8g heap at 1M docs; kept only for low-repetition corpora.
    if tokenizer == "auto":
        tokenizer = "arrow"
    metrics["tokenizer"] = tokenizer
    occurrences = tokenizer == "jvm"
    if occurrences:
        # JVM tokenizer: codegen'd regexp split — ZERO Python in the docs
        # stage (tf counting moves into the assembly kernel's run-collapse)
        tokenized = (
            assigned
            .select(
                "doc_id", "repo", "path", "commit", "lang",
                *(["shard"] if fast_mode else []),
                F.sha2(F.col("content"), 256).alias("sha256"),
                # null content -> empty tokens (matches the Arrow UDF path)
                F.coalesce(
                    tokens_col(F.col("content")),
                    F.array().cast("array<string>"),
                ).alias("tokens"),
            )
            .withColumn("doclen", F.size("tokens"))
            .persist(cache_lvl)
        )
    else:
        # Fused tokenize+tf: one row per (doc, term) into the kernel
        # instead of one per occurrence. "arrow" = byte-level vectorized
        # mapInArrow batch kernel; "jvm_tf" = pure column expressions
        # (array_sort + run-start diffs, zero Python)
        if tokenizer == "jvm_tf":
            tk_expr = tokens_tf_cols(F.col("content"))
        elif tokenizer != "arrow":
            raise ValueError(f"unknown tokenizer {tokenizer!r}")
        if tokenizer == "jvm_tf":
            # inline() = a Generate node: the struct expression is
            # evaluated ONCE per row and fans out to (terms, tfs, doclen)
            # columns. Projecting tk.terms/tk.tfs/tk.doclen instead would
            # let Catalyst collapse the projection and re-evaluate the
            # whole tokenize tree once PER FIELD.
            tokenized = (
                assigned
                .select(
                    "doc_id", "repo", "path", "commit", "lang",
                    *(["shard"] if fast_mode else []),
                    F.sha2(F.col("content"), 256).alias("sha256"),
                    F.inline(F.array(tk_expr)),
                )
                .persist(cache_lvl)
            )
        else:
            # r6: the Arrow tokenizer is a mapInArrow batch kernel (byte-
            # level numpy tokenize + dictionary-encoded tf counting,
            # functions/tokenize.py tokenize_tf_batch) — the former
            # pandas UDF looped per doc (regex findall + np.unique) and
            # materialized every term list as Python objects on return.
            # sha256 stays a JVM expression computed BEFORE the boundary
            # and passes through; content never crosses back (guide §4.1:
            # pass only the columns the function needs, return no payload).
            passthrough = [
                "doc_id", "repo", "path", "commit", "lang",
                *(["shard"] if fast_mode else []), "sha256",
            ]
            pre = assigned.select(
                "doc_id", "repo", "path", "commit", "lang",
                *(["shard"] if fast_mode else []),
                F.sha2(F.col("content"), 256).alias("sha256"),
                "content",
            )
            tk_schema = (
                "doc_id long, repo string, path string, commit string, "
                "lang string, "
                + ("shard int, " if fast_mode else "")
                + "sha256 string, terms array<string>, tfs array<int>, "
                "doclen int"
            )
            tokenized = pre.mapInArrow(
                tokenize_tf_map(passthrough), tk_schema
            ).persist(cache_lvl)
    t_docs = time.time()
    tk = clock.start()
    docs_stage_ran = not (resume and _exists(docs_path) and _exists(stats_path))
    docs_write_job = None
    if docs_stage_ran:
        # r6 (guide §2.6 — overlap independent jobs): the corpus-stats
        # aggregate IS the cache-materialization job (rows stream into the
        # cache store as the agg consumes them; measured +0.6 s over the
        # bare tokenize). The docs parquet write then becomes a cheap
        # column-pruned CACHE read (no terms/tfs decode — measured 0.44 s
        # vs 2+ s inline) and is deferred to run CONCURRENTLY with the
        # postings group jobs below: both are independent readers of the
        # same cache, so the docs write back-fills the postings stage's
        # scheduling gaps instead of serializing in front of it. Still
        # exactly ONE tokenize pass over the corpus.
        spark.sparkContext.setJobDescription("build: tokenize+cache+stats")
        srow = tokenized.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("doclen").alias("avgdl"),
            F.sum("doclen").alias("total_tokens"),
        ).first()
        spark.sparkContext.setJobDescription(None)
        n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"] or 0.0)
        import pyarrow as pa

        _driver_write_rows(
            stats_path, "part-00000.parquet",
            {"n_docs": [n_docs], "avgdl": [avgdl],
             "total_tokens": [int(srow["total_tokens"] or 0)]},
            pa.schema([("n_docs", pa.int64()), ("avgdl", pa.float64()),
                       ("total_tokens", pa.int64())]),
            overwrite=True,
        )
        # the stats agg materialized the tokenized cache: everything
        # downstream reads THAT cache, so the upstream corpus/ranged
        # caches (which hold the raw content column) can be released now
        # instead of pinning executor memory through the postings stage
        ranged_cache.unpersist()
        if cache_input:
            corpus_cached.unpersist()

        def docs_write_job() -> None:
            spark.sparkContext.setJobDescription("build: docs table write")
            tokenized.select(
                "doc_id", "repo", "path", "commit", "lang", "doclen",
                "sha256",
            ).write.mode("overwrite").parquet(docs_path)
            spark.sparkContext.setJobDescription(None)
            metrics["docs_stage_s"] = time.time() - t_docs
    else:  # resumed past the docs stage: recover stats from disk
        sfile = next(
            os.path.join(stats_path, f)
            for f in sorted(fsio.listdir(stats_path))
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        )
        srow = fsio.read_parquet(sfile).to_pandas().iloc[0]
        n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"])
    metrics["n_docs"], metrics["avgdl"] = n_docs, avgdl
    # provisional: the deferred docs write overwrites this on completion
    metrics["docs_stage_s"] = time.time() - t_docs
    clock.stop("docs_write", tk)  # tokenize + sha256 + cache store + stats

    metrics["shard_size"] = shard_size
    metrics["fast_mode"] = fast_mode
    metrics["tokenizer"] = tokenizer

    # --- postings stage, one idempotent job per contiguous shard group -------
    n_shards = p_assign if fast_mode else max(1, math.ceil(n_docs / shard_size))
    shards_per_group = math.ceil(n_shards / n_groups)
    done = _completed_groups(spark, manifest_path) if resume else set()
    attempts = _attempt_counts(spark, manifest_path)
    if (fast_mode and resuming and not shard_bounds
            and done and len(done) < n_groups):
        # (a COMPLETE resume=False index re-opened with resume=True has
        # no groups left to build — that no-op rerun stays legal)
        # completed manifest groups but NO recorded shard bounds can only
        # mean the prior run was resume=False fast mode (a resume=True
        # fast-mode run records bounds BEFORE its first group job):
        # finishing the remaining groups with THIS session's range-sampled
        # partition boundaries would silently split docs differently —
        # docs missing from or duplicated across shards. Refuse loudly.
        raise RuntimeError(
            f"index at {out!r} has {len(done)} completed shard group(s) "
            "but no recorded shard bounds: it was built with resume=False "
            "(not resumable) and crashed. Rerun with resume=False to "
            "rebuild from scratch."
        )

    # per-doc source with a shard column; the explode happens INSIDE each
    # group job AFTER the shard filter, so across all groups every doc is
    # exploded exactly once (no re-explode waste, nothing extra cached)
    if fast_mode and not use_recorded_bounds:
        # shard == cached range partition: group jobs are shuffle-free
        per_doc = tokenized
        # bounds exist ONLY to let a resumed session re-derive the same
        # sharding; with resume=False nothing may resume (a crashed
        # resume=False build must be rerun with resume=False), so the
        # bounds pass over the cache is skipped entirely
        if resume and len(done) < n_groups and shard_bounds is None:
            # record per-shard doc_id bounds so a resumed session (whose
            # range-sampled partition boundaries may differ) can derive
            # the SAME sharding from doc_ids. The bounds come FREE from the
            # assignment's prefix-sum pass (partition p holds exactly
            # [offset[p], offset[p]+count[p]-1]) — the former
            # tokenized.groupBy("shard").max("doc_id") job re-read the
            # whole tokenized cache just to rediscover these numbers.
            shard_bounds = assignment.shard_bounds
            _write_conf()
    elif use_recorded_bounds:
        # derive shard from the recorded bounds: index of the first shard
        # whose max doc_id >= this doc_id (bounds are contiguous ranges).
        # Arrow-vectorized binary search — O(log S) per row. The previous
        # form filtered a literal array per row: an O(S) expression tree
        # that is fine at 32 shards but a giant per-row scan at the 10^5
        # shards a 10^12-doc build implies.
        mxs = np.array([int(m) for _, m in shard_bounds], dtype=np.int64)
        pids = np.array([int(s) for s, _ in shard_bounds], dtype=np.int64)

        @F.pandas_udf("int")
        def _shard_of(doc_id: pd.Series) -> pd.Series:
            # bounds cover the whole corpus by construction (recorded from
            # the first run's per-shard max doc_id); clip only guards the
            # gather against a corrupt conf
            idx = np.searchsorted(mxs, doc_id.to_numpy(), side="left")
            idx = np.minimum(idx, mxs.size - 1)
            return pd.Series(pids[idx].astype("int32"))

        per_doc = tokenized.withColumn("shard", _shard_of("doc_id"))
    else:
        per_doc = tokenized.withColumn(
            "shard", (F.col("doc_id") / shard_size).cast("int")
        )
    needs_shuffle = (not fast_mode) or use_recorded_bounds

    manifest_lock = threading.Lock()

    def run_group(g: int) -> None:
        tg = time.time()
        lo, hi = g * shards_per_group, (g + 1) * shards_per_group
        per_group_p = max(1, shuffle_p // n_groups) if parallel_groups else shuffle_p
        # n_groups=1 covers every shard: no filter, so the single group job
        # is a straight pass over the cache (no per-batch stat evaluation)
        grp_doc = (
            per_doc if n_groups == 1
            else per_doc.filter((F.col("shard") >= lo) & (F.col("shard") < hi))
        )
        # per-DOC rows go straight into the mapInArrow kernel: the former
        # explode -> JVM sortWithinPartitions -> mapInPandas pipeline
        # materialized one skinny row per (doc, term) through the
        # ExternalSorter and the Arrow boundary; the kernel now flattens,
        # sorts (numpy lexsort over dictionary codes) and encodes whole
        # partitions vectorized (operators/assemble.py). When a shuffle is
        # needed, it moves the per-doc list rows — same bytes, ~40x fewer
        # rows than the exploded form (guide §2.3: shuffle fewer rows,
        # explode after).
        cols = ["doc_id", "shard", "doclen"] + (
            ["tokens"] if occurrences else ["terms", "tfs"]
        )
        grp_src = grp_doc.select(*cols)
        if needs_shuffle:
            grp_src = grp_src.repartition(per_group_p, "shard")
        part = grp_src.mapInArrow(
            assemble_postings(avgdl, occurrences), POSTINGS_SCHEMA
        )
        gpath = os.path.join(table_path(out, POSTINGS_DIR), f"group={g}")
        # the manifest metrics ride the postings write itself (Observation
        # collects as rows stream to parquet) — the former
        # spark.read.parquet(gpath).agg(...) re-read the whole group's
        # output from disk, a full extra pass per group
        token = uuid.uuid4().hex[:12]
        gobs = Observation(f"group_{g}_{token}")
        part.observe(
            gobs,
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("df").alias("n_postings"),
            (
                F.sum(F.octet_length("doc_ids_vb"))
                + F.sum(F.octet_length("tfs_vb"))
                + F.sum(F.octet_length("doclens_vb"))
            ).alias("bytes_out"),
        ).write.mode("overwrite").parquet(gpath)
        grp = gobs.get
        with manifest_lock:
            _driver_write_rows(
                manifest_path,
                f"part-g{g}-a{attempts.get(g, 0) + 1}-{token}.parquet",
                {"group": [g], "status": ["ok"],
                 "n_terms": [int(grp["n_terms"] or 0)],
                 "n_postings": [int(grp["n_postings"] or 0)],
                 "bytes_out": [int(grp["bytes_out"] or 0)],
                 "wall_ms": [int((time.time() - tg) * 1000)],
                 "attempt": [attempts.get(g, 0) + 1]},
                _manifest_schema(),
            )

    todo = [g for g in range(n_groups) if g not in done]
    tk = clock.start()
    if parallel_groups and len(todo) + (1 if docs_write_job else 0) > 1:
        # concurrent group jobs keep the cluster saturated (each checkpoint
        # unit is still an independent idempotent write + manifest row);
        # the deferred docs-table write rides the same pool — it reads the
        # same cache and back-fills the group jobs' scheduling gaps
        with ThreadPoolExecutor(
            max_workers=min(4, len(todo) + (1 if docs_write_job else 0))
        ) as ex:
            futures = [ex.submit(run_group, g) for g in todo]
            if docs_write_job is not None:
                futures.append(ex.submit(docs_write_job))
            for f in futures:
                f.result()
    else:
        if docs_write_job is not None:
            docs_write_job()
        for g in todo:
            run_group(g)

    clock.stop("postings", tk)  # flatten + sort + assemble + writes + manifest
    tokenized.unpersist()
    # idempotent re-release for the resume path that skipped the docs stage
    # (the normal path already dropped these right after the docs write)
    ranged_cache.unpersist()
    if cache_input:
        corpus_cached.unpersist()

    # --- lexicon: global per-term stats (the skew "post-merge" — tiny rows) --
    t_lex = time.time()
    postings = spark.read.option("basePath", table_path(out, POSTINGS_DIR)).parquet(
        table_path(out, POSTINGS_DIR)
    )
    lex = postings.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.count("*").alias("n_slices"),
        F.max("max_tfn").alias("max_tfn"),
    )
    tk = clock.start()
    lex.write.mode("overwrite").parquet(lexicon_path)
    metrics["lexicon_stage_s"] = time.time() - t_lex
    clock.stop("lexicon", tk)

    # --- build metrics (north_rule: postings/sec, bytes compressed, skew) ----
    man_pdf = _read_manifest_driver(manifest_path)
    ok = man_pdf[man_pdf["status"] == "ok"]
    # one row per group — the LATEST attempt: a resumed build appends a
    # fresh attempt row for each group it redoes, and each group's data
    # was written mode('overwrite'), so only the newest row describes
    # bytes actually on disk. Summing every ok row double-counted redone
    # groups.
    ok = ok.sort_values("attempt").groupby("group", as_index=False).tail(1)
    metrics["n_postings"] = int(ok["n_postings"].sum())
    metrics["bytes_out"] = int(ok["bytes_out"].sum())
    metrics["n_shards"] = n_shards
    metrics["phases"] = clock.phases
    metrics["wall_s"] = time.time() - t0
    metrics["docs_per_sec"] = n_docs / metrics["wall_s"]
    metrics["postings_per_sec"] = metrics["n_postings"] / metrics["wall_s"]
    # raw posting = (doc_id, tf, doclen) int64 triple
    metrics["bytes_in_raw_postings"] = metrics["n_postings"] * 24
    metrics["compression_ratio"] = (
        metrics["bytes_out"] / metrics["bytes_in_raw_postings"]
        if metrics["n_postings"]
        else 0.0
    )
    fsio.write_text(os.path.join(out, "index_meta.json"),
                    json.dumps(metrics, indent=2))
    return metrics


def _completed_groups(spark: SparkSession, manifest_path: str) -> set[int]:
    man = _read_manifest_driver(manifest_path)
    if man is None:
        return set()
    return set(man.loc[man["status"] == "ok", "group"].astype(int))


def _attempt_counts(spark: SparkSession, manifest_path: str) -> dict[int, int]:
    man = _read_manifest_driver(manifest_path)
    if man is None:
        return {}
    return {
        int(g): int(a)
        for g, a in man.groupby("group")["attempt"].max().items()
    }
