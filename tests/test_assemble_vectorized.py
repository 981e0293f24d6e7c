"""The vectorized multi-group mapInArrow assembly kernel (r6) must emit
byte-identical rows to the single-group reference ``encode_term_postings``
— same group order (shard, term bytewise, doc_id), same per-block delta
restarts, byte offsets and f32-ceil bounds. Pure driver-side: the kernel
factory is exercised directly on Arrow batches, no Spark session."""

import numpy as np
import pyarrow as pa
import pytest

from nyu_search_engine_spark.operators.assemble import (
    assemble_postings,
    encode_term_postings,
)

AVGDL = 37.5


def _doc_batches(rng, n_docs, n_shards, vocab, max_terms, n_batches):
    """Random per-doc tokenized rows in the kernel's input shape."""
    docs = []
    for did in range(n_docs):
        nt = int(rng.integers(0, max_terms + 1))
        terms = sorted(set(rng.choice(vocab, size=nt).tolist()))
        tfs = rng.integers(1, 9, size=len(terms)).astype("int32").tolist()
        doclen = int(sum(tfs))
        docs.append((did % n_shards, did, doclen, terms, tfs))
    docs.sort()  # shard-major like the builder's partition layout
    schema = pa.schema([
        ("shard", pa.int32()), ("doc_id", pa.int64()), ("doclen", pa.int32()),
        ("terms", pa.list_(pa.string())), ("tfs", pa.list_(pa.int32())),
    ])
    out, step = [], max(1, n_docs // n_batches)
    for i in range(0, n_docs, step):
        chunk = docs[i:i + step]
        out.append(pa.record_batch(
            [pa.array([c[j] for c in chunk], schema.field(j).type)
             for j in range(5)], schema=schema))
    return out, docs


def _reference_rows(docs, avgdl):
    """(shard, term) -> encode_term_postings over the flattened postings."""
    groups = {}
    for shard, did, dl, terms, tfs in docs:
        for t, tf in zip(terms, tfs):
            groups.setdefault((shard, t), []).append((did, tf, dl))
    rows = []
    for (shard, term) in sorted(groups):
        ps = sorted(groups[(shard, term)])
        ids = np.array([p[0] for p in ps], dtype=np.int64)
        tfs = np.array([p[1] for p in ps], dtype=np.int64)
        dls = np.array([p[2] for p in ps], dtype=np.int64)
        row = encode_term_postings(ids, tfs, dls, avgdl)
        row["shard"], row["term"] = shard, term
        rows.append(row)
    return rows


@pytest.mark.parametrize("n_docs,n_shards,chunk", [
    (400, 3, None),     # multi-shard partition (explicit shard_size shape)
    (300, 1, None),     # fast-mode partition == one shard
    (500, 2, 64),       # tiny encode slices: chunk boundaries mid-stream
])
def test_vectorized_kernel_matches_reference(n_docs, n_shards, chunk, monkeypatch):
    if chunk is not None:
        import nyu_search_engine_spark.operators.assemble as asm
        monkeypatch.setattr(asm, "ENCODE_CHUNK_POSTINGS", chunk)
    rng = np.random.default_rng(7)
    vocab = np.array([f"t{i:03d}" for i in range(40)])
    batches, docs = _doc_batches(rng, n_docs, n_shards, vocab, 30, 7)
    got = []
    for rb in assemble_postings(AVGDL)(iter(batches)):
        got.extend(rb.to_pylist())
    want = _reference_rows(docs, AVGDL)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["shard"], g["term"]) == (w["shard"], w["term"])
        assert g["df"] == w["df"] and g["cf"] == w["cf"]
        assert g["max_tfn"] == np.float32(w["max_tfn"])
        for col in ("doc_ids_vb", "tfs_vb", "doclens_vb"):
            assert bytes(g[col]) == bytes(w[col]), (g["shard"], g["term"], col)
        gb = [(b["last_doc_id"], np.float32(b["max_tfn"]), b["off_ids"],
               b["off_tfs"], b["off_dls"]) for b in g["blocks"]]
        wb = [(b["last_doc_id"], np.float32(b["max_tfn"]), b["off_ids"],
               b["off_tfs"], b["off_dls"]) for b in w["blocks"]]
        assert gb == wb


def test_occurrence_mode_collapses_runs():
    """occurrences=True input (one list element per token occurrence,
    unsorted) must produce the same bytes as pre-counted tf input."""
    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(12)])
    schema_occ = pa.schema([
        ("shard", pa.int32()), ("doc_id", pa.int64()), ("doclen", pa.int32()),
        ("tokens", pa.list_(pa.string())),
    ])
    docs = []
    for did in range(120):
        toks = rng.choice(vocab, size=int(rng.integers(0, 25))).tolist()
        docs.append((did % 2, did, len(toks), toks))
    docs.sort(key=lambda d: (d[0], d[1]))
    rb = pa.record_batch(
        [pa.array([d[j] for d in docs], schema_occ.field(j).type)
         for j in range(4)], schema=schema_occ)
    got = []
    for b in assemble_postings(AVGDL, occurrences=True)(iter([rb])):
        got.extend(b.to_pylist())
    # reference: collapse occurrences to tf counts per (shard, term, doc)
    flat = []
    for shard, did, dl, toks in docs:
        for t in sorted(set(toks)):
            flat.append((shard, did, dl, t, toks.count(t)))
    groups = {}
    for shard, did, dl, t, tf in flat:
        groups.setdefault((shard, t), []).append((did, tf, dl))
    want = []
    for key in sorted(groups):
        ps = sorted(groups[key])
        row = encode_term_postings(
            np.array([p[0] for p in ps]), np.array([p[1] for p in ps]),
            np.array([p[2] for p in ps]), AVGDL)
        row["shard"], row["term"] = key
        want.append(row)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["shard"], g["term"]) == (w["shard"], w["term"])
        for col in ("doc_ids_vb", "tfs_vb", "doclens_vb"):
            assert bytes(g[col]) == bytes(w[col])


def test_empty_partition_yields_nothing():
    assert list(assemble_postings(AVGDL)(iter([]))) == []
    empty = pa.record_batch(
        [pa.array([], pa.int32()), pa.array([], pa.int64()),
         pa.array([], pa.int32()),
         pa.array([], pa.list_(pa.string())), pa.array([], pa.list_(pa.int32()))],
        names=["shard", "doc_id", "doclen", "terms", "tfs"])
    assert list(assemble_postings(AVGDL)(iter([empty]))) == []
