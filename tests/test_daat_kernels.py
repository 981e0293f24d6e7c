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
