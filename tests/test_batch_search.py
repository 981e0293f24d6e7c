"""Batched multi-query search (SURVEY §2.5/T3 batch form): one postings
scan answers every query; results must be rank- AND score-identical to the
single-query pruned path (same kernels, same rarest-first float order)."""

from __future__ import annotations

import pytest

from nyu_search_engine_spark.plans.search import Query

BATCH = {
    1: Query(("rareterm00", "rareterm01"), "AND"),
    2: Query(("rareterm02", "hotterm0"), "AND"),
    3: Query(("hotterm0", "hotterm1", "hotterm2"), "AND", 5),
    4: Query(("rareterm00", "oovterm"), "AND"),        # OOV -> no rows
    5: Query(("hotterm0", "rareterm07"), "OR"),
    6: Query(("hotterm0", "hotterm1", "hotterm2", "hotterm3"), "OR", 20),
    7: Query(("def", "return", "class"), "OR"),        # engineered ties
    8: Query(("oovterm",), "OR"),                      # all-OOV -> no rows
}


def _single(searcher, q):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in searcher.search(q, "pruned", decorate=False).collect()
    ]


def test_batch_equals_single_query(searcher):
    got = {}
    for r in searcher.search_batch(BATCH).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid in got:
        got[qid].sort()
    for qid, q in BATCH.items():
        assert got.get(qid, []) == _single(searcher, q), f"query {qid}"


def test_batch_decorated_schema(searcher):
    out = searcher.search_batch({1: BATCH[5]}, decorate=True)
    assert out.columns == [
        "query_id", "rank", "doc_id", "score", "repo", "path", "commit"
    ]
    rows = out.collect()
    assert len(rows) == len(_single(searcher, BATCH[5]))


def test_batch_empty_inputs(searcher):
    assert searcher.search_batch({}).count() == 0
    assert searcher.search_batch({1: Query(("oovterm",), "AND")}).count() == 0
