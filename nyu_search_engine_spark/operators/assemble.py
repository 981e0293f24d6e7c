"""Posting-list assembly (SURVEY.md §2.4 A4/A5/A7 + §2.6 T1/T2).

Reference locus: inverted-index/main:spiller+merger — memory-budgeted sorted
temp runs, then a k-way heap merge producing per-term compressed lists
(/root/reference/README.md:6). Spark-first shape (r6 optimization, guide
§2.3/§4.2): the kernel is ONE ``mapInArrow`` over the per-doc tokenized
rows — the former pipeline (JVM explode to one row per (doc, term) ->
ExternalSorter string sort -> Arrow transfer of every exploded row ->
per-(shard,term) Python loop) moved ~20M skinny rows through the JVM sort
and the Arrow boundary and then paid ~160k per-group numpy-call rounds.
Now the token lists cross the boundary once (Arrow list columns, term
bytes stored per doc, not per posting), the sort is a numpy lexsort over
dictionary-encoded terms, and ALL groups of a partition are encoded in a
handful of whole-partition vectorized passes (measured 5.6x on the encode
alone; the explode/sort/transfer disappear entirely). Byte-identical
output to ``encode_term_postings`` per group (pytest-enforced).

Correctness requirement inherited from the old shape: every shard must be
entirely contained in one input partition (fast mode: partition == shard;
explicit shard_size: hash repartition by shard) — the kernel groups
whatever complete shards it is handed.

Skew (A7): the shard IS the salt. ``shard = doc_id // SHARD_SIZE`` bounds
every (shard, term) group at SHARD_SIZE postings, so a stopword-grade hot
term can never concentrate on one reducer no matter the corpus size; the
"post-merge" is the lexicon aggregation (tiny rows) plus the query-time
per-shard fan-out.

Block-max (A5): per 128-posting block we store last_doc_id, byte offsets
into the three varbyte payloads (each block restarts delta encoding, so
blocks decode independently == skip pointers), and the block's max
*idf-free* BM25 factor ``max_tfn`` (idf is a per-term constant, applied at
query time from the global lexicon — this is what makes per-shard build
independent of global df). max_tfn is rounded UP to float32 so the bound
stays admissible for WAND pruning.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..constants import BLOCK_SIZE
from ..functions.bm25 import tf_part_np
from ..functions.varbyte import delta_encode, vb_encode, vb_nbytes

POSTINGS_SCHEMA = (
    "shard int, term string, df int, cf long, max_tfn float, "
    "doc_ids_vb binary, tfs_vb binary, doclens_vb binary, "
    "blocks array<struct<last_doc_id: long, max_tfn: float, "
    "off_ids: int, off_tfs: int, off_dls: int>>"
)

# Group-aligned encode slice bound: caps the vectorized encoder's
# temporaries (~50 B/posting) AND keeps each output RecordBatch's binary
# payloads far under Arrow's 2 GiB 32-bit-offset limit. 4M postings
# ≈ 200 MB of temporaries, ≈ 6-10 MB of varbyte payload per stream.
ENCODE_CHUNK_POSTINGS = 4_000_000


def f32_ceil(arr: np.ndarray) -> np.ndarray:
    """float64 -> float32 rounded toward +inf (admissible upper bounds)."""
    f32 = arr.astype(np.float32)
    low = f32.astype(np.float64) < arr
    f32[low] = np.nextafter(f32[low], np.float32(np.inf))
    return f32


def encode_term_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray, avgdl: float
) -> dict:
    """One (shard, term) group -> one compressed postings row (dict).

    The single-group reference implementation: the streaming path
    (streaming/incremental.py) uses it directly, and the vectorized
    multi-group encoder below is pytest-pinned byte-identical to it.
    """
    n = doc_ids.size
    ids_u = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs_u = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls_u = np.ascontiguousarray(doclens, dtype=np.uint64)
    tfn = tf_part_np(tfs, doclens, avgdl)
    starts = np.arange(0, n, BLOCK_SIZE)
    ends = np.minimum(starts + BLOCK_SIZE, n)

    gaps = delta_encode(ids_u)
    gaps[starts] = ids_u[starts]  # delta restarts: block-first is absolute

    def payload_and_offsets(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
        nb = vb_nbytes(vals)
        off = np.concatenate(([0], np.cumsum(nb)[:-1]))
        return vb_encode(vals), off[starts]

    ids_b, off_ids = payload_and_offsets(gaps)
    tfs_b, off_tfs = payload_and_offsets(tfs_u)
    dls_b, off_dls = payload_and_offsets(dls_u)
    maxes = f32_ceil(np.maximum.reduceat(tfn, starts))
    lasts = ids_u[ends - 1].astype(np.int64)
    blocks = [
        {
            "last_doc_id": int(lasts[i]),
            "max_tfn": float(maxes[i]),
            "off_ids": int(off_ids[i]),
            "off_tfs": int(off_tfs[i]),
            "off_dls": int(off_dls[i]),
        }
        for i in range(starts.size)
    ]
    return {
        "df": int(n),
        "cf": int(tfs_u.sum()),
        "max_tfn": float(maxes.max()),
        "doc_ids_vb": ids_b,
        "tfs_vb": tfs_b,
        "doclens_vb": dls_b,
        "blocks": blocks,
    }


def _arrow_postings_schema():
    import pyarrow as pa

    # field-for-field Arrow twin of POSTINGS_SCHEMA (mapInArrow validates)
    return pa.schema([
        ("shard", pa.int32()),
        ("term", pa.string()),
        ("df", pa.int32()),
        ("cf", pa.int64()),
        ("max_tfn", pa.float32()),
        ("doc_ids_vb", pa.binary()),
        ("tfs_vb", pa.binary()),
        ("doclens_vb", pa.binary()),
        ("blocks", pa.list_(pa.struct([
            ("last_doc_id", pa.int64()),
            ("max_tfn", pa.float32()),
            ("off_ids", pa.int32()),
            ("off_tfs", pa.int32()),
            ("off_dls", pa.int32()),
        ]))),
    ])


def _encode_group_slice(shard, term_vals, ids, tfs, dls, gstarts, avgdl):
    """Vectorized multi-group encoder: one RecordBatch for a group-aligned
    slice of a sorted postings run.

    Inputs: per-posting arrays sorted by (shard, term, doc_id);
    ``gstarts`` = slice-local start index of each (shard, term) group;
    ``term_vals`` = pyarrow StringArray with one term per GROUP. Emits the
    exact bytes of ``encode_term_postings`` applied per group — per-block
    delta restarts, byte offsets and f32-ceil bounds are all computed with
    whole-slice reductions (cumsum / reduceat) instead of a Python loop.
    """
    import pyarrow as pa

    N = ids.size
    G = gstarts.size
    gsizes = np.diff(np.append(gstarts, N))
    pos = np.arange(N, dtype=np.int64) - np.repeat(gstarts, gsizes)
    bstarts = np.flatnonzero(pos % BLOCK_SIZE == 0)
    blk_per_grp = -(-gsizes // BLOCK_SIZE)
    blk_goffs = np.concatenate(([0], np.cumsum(blk_per_grp)))

    ids_u = ids.astype(np.uint64)
    gaps = np.empty(N, dtype=np.uint64)
    gaps[0] = ids_u[0]
    np.subtract(ids_u[1:], ids_u[:-1], out=gaps[1:])
    gaps[bstarts] = ids_u[bstarts]  # delta restarts at every block start
    tfn = tf_part_np(tfs, dls, avgdl)

    gend = np.append(gstarts, N)

    def enc(vals):
        nb = vb_nbytes(vals)
        cum = np.concatenate(([0], np.cumsum(nb)))
        payload = vb_encode(vals)
        grp_off = cum[gend]                          # G+1 group byte bounds
        blk_off = cum[bstarts] - np.repeat(grp_off[:-1], blk_per_grp)
        return payload, grp_off, blk_off

    ids_pay, ids_goff, ids_boff = enc(gaps)
    tfs_pay, tfs_goff, tfs_boff = enc(tfs.astype(np.uint64))
    dls_pay, dls_goff, dls_boff = enc(dls.astype(np.uint64))

    bends = np.append(bstarts[1:], N)
    maxes = f32_ceil(np.maximum.reduceat(tfn, bstarts))
    lasts = ids[bends - 1].astype(np.int64)

    df_g = gsizes.astype(np.int32)
    cf_g = np.add.reduceat(tfs, gstarts).astype(np.int64) if N else np.empty(0, np.int64)
    gmax = np.maximum.reduceat(maxes, blk_goffs[:-1]).astype(np.float32)

    def binarr(payload: bytes, goff: np.ndarray):
        return pa.Array.from_buffers(
            pa.binary(), G,
            [None, pa.py_buffer(goff.astype(np.int32)), pa.py_buffer(payload)],
        )

    blocks_struct = pa.StructArray.from_arrays(
        [
            pa.array(lasts, pa.int64()),
            pa.array(maxes, pa.float32()),
            pa.array(ids_boff.astype(np.int32), pa.int32()),
            pa.array(tfs_boff.astype(np.int32), pa.int32()),
            pa.array(dls_boff.astype(np.int32), pa.int32()),
        ],
        ["last_doc_id", "max_tfn", "off_ids", "off_tfs", "off_dls"],
    )
    blocks = pa.ListArray.from_arrays(
        pa.array(blk_goffs.astype(np.int32), pa.int32()), blocks_struct
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(shard[gstarts].astype(np.int32), pa.int32()),
            term_vals,
            pa.array(df_g, pa.int32()),
            pa.array(cf_g, pa.int64()),
            pa.array(gmax, pa.float32()),
            binarr(ids_pay, ids_goff),
            binarr(tfs_pay, tfs_goff),
            binarr(dls_pay, dls_goff),
            blocks,
        ],
        schema=_arrow_postings_schema(),
    )


def assemble_postings(avgdl: float, occurrences: bool = False):
    """mapInArrow factory: per-doc tokenized rows -> one row per
    (shard, term). The reference's temp-run sort/merge happens INSIDE the
    kernel as a numpy lexsort over dictionary-encoded terms.

    occurrences=False: input rows are (shard, doc_id, doclen, terms, tfs)
    — token lists with tf pre-counted (Arrow / jvm_tf tokenizer paths).
    occurrences=True: input rows are (shard, doc_id, doclen, tokens) —
    one list element per token OCCURRENCE (JVM tokenizer path); the
    kernel collapses equal (shard, term, doc_id) runs into tf counts.

    The whole partition is materialized in the Python worker (the builder
    bounds partitions at ~32 MB of input — ASSIGN_PARTITION_TARGET_MAX
    in plans/build_index.py — so the flattened arrays stay a few hundred
    MB worst-case); output is streamed in group-aligned RecordBatches of
    <= ENCODE_CHUNK_POSTINGS postings.
    """

    def walk(batches) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        tbls = [pa.Table.from_batches([b]) for b in batches]
        if not tbls:
            return
        tbl = pa.concat_tables(tbls).combine_chunks()
        if tbl.num_rows == 0:
            return
        token_col = "tokens" if occurrences else "terms"
        lists = tbl[token_col].combine_chunks()
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        doc_of = np.repeat(tbl["doc_id"].to_numpy(), lens)
        dl_of = np.repeat(tbl["doclen"].to_numpy(zero_copy_only=False).astype(np.int64), lens)
        shard_of = np.repeat(
            tbl["shard"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        if doc_of.size == 0:
            return
        # dictionary-encode terms; rank codes by bytewise-sorted dictionary
        # (tokens are ASCII [a-z0-9]+, where UTF-8 byte order == the old
        # JVM UTF8String sort order)
        denc = flat.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = denc.dictionary
        nd = len(dictionary)
        order = pc.sort_indices(dictionary).to_numpy(zero_copy_only=False).astype(np.int64)
        rank = np.empty(max(nd, 1), dtype=np.int64)
        rank[order] = np.arange(nd)
        rcodes = rank[codes]
        sorted_dict = dictionary.take(pa.array(order))

        if occurrences:
            tfs_of = None
        else:
            tfs_of = pc.list_flatten(tbl["tfs"].combine_chunks()) \
                .to_numpy(zero_copy_only=False).astype(np.int64)

        # the temp-run merge: sort postings by (shard, term, doc_id)
        sidx = np.lexsort((doc_of, rcodes, shard_of))
        shard_s = shard_of[sidx]
        rcode_s = rcodes[sidx]
        ids_s = doc_of[sidx]
        dls_s = dl_of[sidx]
        if occurrences:
            # collapse equal (shard, term, doc_id) occurrence runs -> tf
            chg = np.empty(ids_s.size, dtype=bool)
            chg[0] = True
            chg[1:] = (
                (shard_s[1:] != shard_s[:-1])
                | (rcode_s[1:] != rcode_s[:-1])
                | (ids_s[1:] != ids_s[:-1])
            )
            firsts = np.flatnonzero(chg)
            tfs_s = np.diff(np.append(firsts, ids_s.size)).astype(np.int64)
            shard_s, rcode_s = shard_s[firsts], rcode_s[firsts]
            ids_s, dls_s = ids_s[firsts], dls_s[firsts]
        else:
            tfs_s = tfs_of[sidx]

        # (shard, term) group starts over the collapsed, sorted run
        gchg = np.empty(ids_s.size, dtype=bool)
        gchg[0] = True
        gchg[1:] = (shard_s[1:] != shard_s[:-1]) | (rcode_s[1:] != rcode_s[:-1])
        gstarts_all = np.flatnonzero(gchg)

        # emit group-aligned slices (memory + 32-bit Arrow offset bound)
        N = ids_s.size
        lo_g = 0
        while lo_g < gstarts_all.size:
            lo = int(gstarts_all[lo_g])
            hi_g = int(
                np.searchsorted(gstarts_all, lo + ENCODE_CHUNK_POSTINGS, "right")
            )
            hi_g = max(hi_g, lo_g + 1)  # a single giant group still emits
            hi = int(gstarts_all[hi_g]) if hi_g < gstarts_all.size else N
            gs = gstarts_all[lo_g:hi_g] - lo
            term_vals = sorted_dict.take(pa.array(rcode_s[gstarts_all[lo_g:hi_g]]))
            yield _encode_group_slice(
                shard_s[lo:hi], term_vals, ids_s[lo:hi], tfs_s[lo:hi],
                dls_s[lo:hi], gs, avgdl,
            )
            lo_g = hi_g

    return walk
