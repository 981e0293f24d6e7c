"""Kernel-level randomized property tests for the DAAT/BMW kernels —
no Spark, pure numpy: shard_topk_and / shard_topk_or vs brute-force
scoring over multi-block posting lists (catches block-boundary and
segment-pruning bugs that tiny corpora never hit)."""

import numpy as np
import pytest

from nyu_search_engine_spark.functions.bm25 import tf_part_np
from nyu_search_engine_spark.operators.assemble import encode_term_postings
from nyu_search_engine_spark.operators.daat import (
    TermSlice,
    shard_topk_and,
    shard_topk_or,
)

AVGDL = 400.0


def _make_slices(rng, n_terms, universe, min_df, max_df):
    """Random term lists -> [(term, idf, TermSlice)] + raw postings."""
    slices, raw = [], {}
    for t in range(n_terms):
        df = int(rng.integers(min_df, max_df))
        ids = np.sort(rng.choice(universe, size=df, replace=False)).astype(np.uint64)
        tfs = rng.integers(1, 8, df).astype(np.uint64)
        dls = rng.integers(30, 800, df).astype(np.uint64)
        row = encode_term_postings(ids, tfs, dls, AVGDL)
        row["term"] = f"t{t}"
        idf = float(np.log(1 + (t + 1) * 0.7))  # arbitrary positive idfs
        slices.append((f"t{t}", idf, TermSlice(row)))
        raw[f"t{t}"] = (ids.astype(np.int64), tfs.astype(np.int64), dls.astype(np.int64), idf)
    return slices, raw


def _brute(raw, mode, k):
    """Reference scoring: accumulate partials in the given term order."""
    scores: dict[int, float] = {}
    counts: dict[int, int] = {}
    for term in raw:  # dict order == slices order == kernel term order
        ids, tfs, dls, idf = raw[term]
        partial = idf * tf_part_np(tfs, dls, AVGDL)
        for i, d in enumerate(ids):
            scores[d] = scores.get(d, 0.0) + float(partial[i])
            counts[d] = counts.get(d, 0) + 1
    items = [
        (d, s) for d, s in scores.items()
        if mode == "OR" or counts[d] == len(raw)
    ]
    items.sort(key=lambda x: (-x[1], x[0]))
    return items[:k]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 10, 100])
def test_or_kernel_matches_bruteforce(seed, k):
    rng = np.random.default_rng(seed)
    slices, raw = _make_slices(rng, n_terms=4, universe=20_000,
                               min_df=300, max_df=4_000)
    ids, scores = shard_topk_or(slices, k, AVGDL)
    got = list(zip(ids.tolist(), scores.tolist()))
    want = _brute(raw, "OR", k)
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want],
                               rtol=0, atol=1e-12)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 10, 100])
def test_and_kernel_matches_bruteforce(seed, k):
    rng = np.random.default_rng(1000 + seed)
    # dense lists so intersections are non-trivially sized
    slices, raw = _make_slices(rng, n_terms=3, universe=3_000,
                               min_df=1_000, max_df=2_500)
    ids, scores = shard_topk_and(slices, k, AVGDL)
    got = list(zip(ids.tolist(), scores.tolist()))
    want = _brute(raw, "AND", k)
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want],
                               rtol=0, atol=1e-12)


def test_or_kernel_zero_idf_all_ties():
    rng = np.random.default_rng(5)
    slices, raw = _make_slices(rng, n_terms=2, universe=5_000,
                               min_df=1_000, max_df=2_000)
    slices = [(t, 0.0, sl) for t, _, sl in slices]  # idf floor case
    ids, scores = shard_topk_or(slices, 10, AVGDL)
    assert (scores == 0.0).all()
    assert ids.tolist() == sorted(ids.tolist())  # pure doc_id tie-break


def test_and_empty_intersection():
    rng = np.random.default_rng(9)
    # disjoint ranges -> empty intersection
    a_ids = np.arange(0, 500, dtype=np.uint64)
    b_ids = np.arange(10_000, 10_500, dtype=np.uint64)
    rows = []
    for ids in (a_ids, b_ids):
        tfs = rng.integers(1, 5, ids.size).astype(np.uint64)
        dls = rng.integers(30, 800, ids.size).astype(np.uint64)
        rows.append(encode_term_postings(ids, tfs, dls, AVGDL))
    slices = [("a", 1.0, TermSlice(rows[0])), ("b", 1.0, TermSlice(rows[1]))]
    ids, scores = shard_topk_and(slices, 10, AVGDL)
    assert ids.size == 0 and scores.size == 0


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("k", [1, 5, 50])
def test_and_kernel_multichunk_pruning_matches_bruteforce(seed, k):
    # rarest list spans MANY candidate chunks (df >> AND_CHUNK_BLOCKS*128)
    # so the theta-based block-max pruning path is actually exercised
    rng = np.random.default_rng(7000 + seed)
    slices, raw = _make_slices(rng, n_terms=3, universe=60_000,
                               min_df=8_000, max_df=20_000)
    ids, scores = shard_topk_and(slices, k, AVGDL)
    got = list(zip(ids.tolist(), scores.tolist()))
    want = _brute(raw, "AND", k)
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want],
                               rtol=0, atol=1e-12)


def test_and_kernel_bound_pruning_skips_decodes():
    # engineered skew: docs 0..99 carry huge tf in both lists, everything
    # after scores far below theta -- candidates past chunk 1 must be
    # dropped BEFORE list 2 is probed, so list 2 decodes only the blocks
    # covering chunk-1 candidates (pruning visible in the decode cache)
    n = 10_000
    ids = np.arange(n, dtype=np.uint64)
    dls = np.full(n, 400, dtype=np.uint64)
    tf_a = np.where(ids < 100, 50, 1).astype(np.uint64)
    tf_b = np.where(ids < 100, 50, 1).astype(np.uint64)
    row_a = encode_term_postings(ids, tf_a, dls, AVGDL)
    row_b = encode_term_postings(ids, tf_b, dls, AVGDL)
    sa, sb = TermSlice(row_a), TermSlice(row_b)
    slices = [("a", 2.0, sa), ("b", 2.0, sb)]
    out_ids, out_scores = shard_topk_and(slices, 10, AVGDL)
    assert out_ids.tolist() == list(range(10))  # ties -> doc_id ASC
    # brute check of the winning score
    want = 2 * 2.0 * float(tf_part_np(np.array([50]), np.array([400]), AVGDL)[0])
    np.testing.assert_allclose(out_scores, np.full(10, want), rtol=0, atol=1e-12)
    from nyu_search_engine_spark.operators.daat import AND_CHUNK_BLOCKS
    assert sb.n_blocks > 2 * AND_CHUNK_BLOCKS
    assert len(sb._cache) <= AND_CHUNK_BLOCKS  # later chunks never decoded b
