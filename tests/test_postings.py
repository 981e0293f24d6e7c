"""Postings payload integrity: decoded lists equal the tokenizer truth;
block directory offsets/boundaries are exact; block max_tfn bounds are
admissible (>= every actual tf-part in the block, float32-ceil)."""

import numpy as np
from pyspark.sql import functions as F

from nyu_search_engine_spark.constants import BLOCK_SIZE
from nyu_search_engine_spark.functions.bm25 import tf_part_np
from nyu_search_engine_spark.functions.tokenize import tokenize_py
from nyu_search_engine_spark.operators.daat import TermSlice
from nyu_search_engine_spark.sources import index_io


def _truth(spark, index_root, corpus_pdf):
    """(term -> sorted [(doc_id, tf, doclen)]) from first principles."""
    docs = index_io.read_docs(spark, index_root).toPandas()
    id_by_key = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"] for _, r in docs.iterrows()
    }
    truth: dict[str, list[tuple[int, int, int]]] = {}
    for _, r in corpus_pdf.iterrows():
        toks = tokenize_py(r["content"])
        did = id_by_key[(r["repo"], r["path"], r["commit"])]
        for t in set(toks):
            truth.setdefault(t, []).append((did, toks.count(t), len(toks)))
    for v in truth.values():
        v.sort()
    return truth


def test_decoded_postings_match_truth(spark, index_root, corpus_pdf):
    truth = _truth(spark, index_root, corpus_pdf)
    rows = index_io.read_postings(spark, index_root).collect()
    got: dict[str, list[tuple[int, int, int]]] = {}
    for r in rows:
        # payloads are per-block delta-restarted; decode block-wise
        sl = TermSlice(r)
        ids, tfs, dls = sl.decode_all()
        got.setdefault(r["term"], []).extend(
            zip(ids.tolist(), tfs.tolist(), dls.tolist())
        )
    for term in got:
        got[term].sort()
    assert set(got) == set(truth)
    for term in truth:
        assert got[term] == truth[term], f"postings mismatch for {term}"


def test_block_directory_and_bounds(spark, index_root):
    stats = index_io.read_stats(spark, index_root)
    avgdl = float(stats["avgdl"])
    rows = index_io.read_postings(spark, index_root).collect()
    assert rows
    for r in rows:
        sl = TermSlice(r)
        n_blocks = sl.n_blocks
        assert n_blocks == -(-r["df"] // BLOCK_SIZE)
        prev_last = -1
        for b in range(n_blocks):
            ids, tfs, dls = sl.decode_block(b)
            assert ids.size <= BLOCK_SIZE
            assert (np.diff(ids) > 0).all()
            assert ids[0] > prev_last  # blocks ascend, delta restarts per block
            prev_last = int(ids[-1])
            assert prev_last == sl.lasts[b]
            actual = tf_part_np(tfs, dls, avgdl).max()
            assert sl.max_tfn[b] >= actual, "inadmissible block bound"
