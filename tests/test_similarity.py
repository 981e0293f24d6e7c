"""Similarity search: brute-force top-k matches a numpy oracle; batch
variant agrees with per-query runs; LSH path has bounded recall loss and
every returned distance is exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyu_search_engine_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(123)
    vecs = rng.standard_normal((400, 16)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.persist().count()
    return df, vecs


def _numpy_topk(vecs, q, k, exclude=None):
    sims = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(vecs)), -sims))
    out = [(int(i), float(sims[i])) for i in order if i != exclude]
    return out[:k]


def test_cosine_topk_matches_numpy(emb):
    df, vecs = emb
    q = vecs[0].astype(np.float64)
    got = [
        (r["id"], r["cosine"])
        for r in similarity.cosine_topk(df, "vec_id", "embedding",
                                        q.tolist(), 10, exclude_id=0).collect()
    ]
    want = _numpy_topk(vecs.astype(np.float64), q, 10, exclude=0)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-9


def test_batch_topk_agrees_with_single(emb):
    df, vecs = emb
    queries = df.filter(F.col("vec_id").isin([1, 5, 9]))
    batch = similarity.cosine_topk_batch(
        df, "vec_id", "embedding", queries, "vec_id", "embedding", 5
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"], r["cosine"]))
    for qid in (1, 5, 9):
        single = [
            (r["rank"], r["id"], r["cosine"])
            for r in similarity.cosine_topk(
                df, "vec_id", "embedding", vecs[qid].tolist(), 5, exclude_id=qid
            ).collect()
        ]
        got = sorted(by_q[qid])
        assert [g[1] for g in got] == [s[1] for s in single]
        for g, s in zip(got, single):
            assert abs(g[2] - s[2]) < 1e-9


def test_lsh_topk_recall_and_exactness(emb):
    df, vecs = emb
    q = vecs[3].astype(np.float64)
    approx = [
        (r["id"], r["cosine"])
        for r in similarity.lsh_topk(df, "vec_id", "embedding", q.tolist(),
                                     10, n_planes=4, exclude_id=3).collect()
    ]
    exact = _numpy_topk(vecs.astype(np.float64), q, 10, exclude=3)
    exact_ids = {e[0] for e in exact}
    got_ids = {a[0] for a in approx}
    # multi-probe over 5 of 16 buckets: expect decent overlap, not identity
    assert len(got_ids & exact_ids) >= 3
    # every returned cosine is the true cosine (approximation only in recall)
    truth = dict(_numpy_topk(vecs.astype(np.float64), q, 400))
    for vid, cos in approx:
        assert abs(cos - truth[vid]) < 1e-9


def test_hyperplanes_deterministic():
    a = similarity.hyperplanes(16, 4, seed=42)
    b = similarity.hyperplanes(16, 4, seed=42)
    assert (a == b).all()


def test_ivf_index_recall_exactness_and_pruning(spark, emb, tmp_path):
    """IVF path: deterministic sample-trained centroids; probing the
    nearest clusters returns true cosines with bounded recall loss, and
    the probe scan partition-prunes on cluster."""
    df, vecs = emb
    root = str(tmp_path / "ivf_idx")
    meta = similarity.build_ivf_index(df, "vec_id", "embedding", root,
                                      k=8, iters=5, train_ids_below=256)
    assert len(meta["centroids"]) == 8
    q = vecs[3].astype(np.float64)
    res = similarity.ivf_topk(spark, root, q.tolist(), 10, nprobe=3,
                              exclude_id=3)
    approx = [(r["id"], r["cosine"]) for r in res.collect()]
    exact = _numpy_topk(vecs.astype(np.float64), q, 10, exclude=3)
    # nprobe=3 of 8 clusters: decent overlap expected, not identity
    assert len({a[0] for a in approx} & {e[0] for e in exact}) >= 4
    truth = dict(_numpy_topk(vecs.astype(np.float64), q, 400))
    for vid, cos in approx:
        assert abs(cos - truth[vid]) < 1e-9
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        res.explain("formatted")
    txt = buf.getvalue()
    assert "PartitionFilters" in txt and "cluster" in txt


def test_indexed_lsh_matches_on_the_fly_and_prunes(spark, emb, tmp_path):
    """The persisted bucket index returns IDENTICAL results to the
    per-query bucketing path, and the probe scan reads only the probed
    bucket partitions (partition pruning on bucket IN (...))."""
    df, vecs = emb
    root = str(tmp_path / "ann_idx")
    meta = similarity.build_ann_index(df, "vec_id", "embedding", root,
                                      n_planes=4, seed=42)
    assert meta["dim"] == 16
    q = vecs[3].astype(np.float64)
    onfly = [
        (r["rank"], r["id"], r["cosine"])
        for r in similarity.lsh_topk(df, "vec_id", "embedding", q.tolist(),
                                     10, n_planes=4, exclude_id=3).collect()
    ]
    res = similarity.lsh_topk_indexed(spark, root, q.tolist(), 10, exclude_id=3)
    indexed = [(r["rank"], r["id"], r["cosine"]) for r in res.collect()]
    assert indexed == onfly
    # pruning: the physical scan's partition filters mention bucket
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        res.explain("formatted")
    txt = buf.getvalue()
    assert "PartitionFilters" in txt and "bucket" in txt


def test_lsh_high_plane_count_recall_and_pruning(spark, tmp_path):
    """Sizing guidance holds at scale-shaped plane counts (VERDICT r2 #8):
    with n_planes=10 (1024 buckets) over clustered embeddings, the
    persisted index still finds the true neighbors (near-dup vectors are
    ~parallel, so sign bits agree) and the probe scan stays partition-
    pruned to the <= n_planes+1 probed buckets."""
    rng = np.random.default_rng(77)
    centers = rng.standard_normal((32, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, 40, axis=0) + 0.02 * rng.standard_normal((1280, 32))
    vecs = vecs.astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    root = str(tmp_path / "ann_idx_10p")
    similarity.build_ann_index(df, "vec_id", "embedding", root,
                               n_planes=10, seed=42)
    q = vecs[5].astype(np.float64)  # member of cluster 0
    res = similarity.lsh_topk_indexed(spark, root, q.tolist(), 10, exclude_id=5)
    got = [r["id"] for r in res.collect()]
    want = [i for i, _ in _numpy_topk(vecs.astype(np.float64), q, 10, exclude=5)]
    recall = len(set(got) & set(want)) / 10
    assert recall >= 0.8, f"recall {recall} with got={got} want={want}"

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        res.explain("formatted")
    txt = buf.getvalue()
    assert "PartitionFilters" in txt and "bucket" in txt
