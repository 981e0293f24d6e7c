"""Varbyte + delta-gap compression (SURVEY.md §2.8 F3/F4/F5, pinned §8.2).

Reference locus: inverted-index/main:compress + query-processor/main:
decompress (/root/reference/README.md:6-7). Convention: per uint64,
little-endian 7-bit groups, least-significant group first, high bit =
continuation (1 => more bytes follow). docIDs stored as ascending gaps
(first value absolute); tf / doclen values stored raw.

Both directions are numpy-vectorized over whole posting lists — the only
Python-level loop is over the <=10 byte positions of a uint64, never over
values (mandated no-per-row-Python, BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np

from ..constants import BLOCK_SIZE

_MAX_VB_BYTES = 10  # ceil(64 / 7)


def vb_nbytes(arr: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (vectorized)."""
    nbytes = np.ones(arr.size, dtype=np.int64)
    for j in range(1, _MAX_VB_BYTES):
        nbytes += (arr >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
    return nbytes


def vb_encode(values: np.ndarray | list[int]) -> bytes:
    """Varbyte-encode a sequence of non-negative ints (< 2**64)."""
    arr = np.ascontiguousarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    nbytes = vb_nbytes(arr)
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for j in range(_MAX_VB_BYTES):
        mask = nbytes > j
        if not mask.any():
            break
        grp = ((arr[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        grp |= (nbytes[mask] > j + 1).astype(np.uint8) << 7  # continuation bit
        out[starts[mask] + j] = grp
    return out.tobytes()


def vb_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Inverse of ``vb_encode`` -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    # value index for every byte, then byte position within its value
    val_idx = np.cumsum(np.concatenate(([0], is_last[:-1].astype(np.int64))))
    pos = np.arange(b.size, dtype=np.int64) - starts[val_idx]
    contrib = (b & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64)
    vals = np.zeros(ends.size, dtype=np.uint64)
    np.add.at(vals, val_idx, contrib)
    return vals


def delta_encode(ascending: np.ndarray) -> np.ndarray:
    """Strictly-ascending ints -> [first, gap, gap, ...]."""
    arr = np.ascontiguousarray(ascending, dtype=np.uint64)
    if arr.size == 0:
        return arr
    out = np.empty_like(arr)
    out[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def vb_encode_docids(doc_ids: np.ndarray | list[int]) -> bytes:
    return vb_encode(delta_encode(np.ascontiguousarray(doc_ids, dtype=np.uint64)))


def vb_decode_docids(buf: bytes) -> np.ndarray:
    """Decode ONE delta run (absolute first value, then gaps).

    Correct for a single block-max block (each block restarts delta
    encoding with an absolute docID, operators/assemble.py). For a full
    multi-block payload use ``vb_decode_docids_blocked`` — a plain cumsum
    over the whole payload would add the absolute block-start values into
    the running sum and corrupt every docID past the first block.
    """
    return delta_decode(vb_decode(buf))


def vb_decode_docids_blocked(buf: bytes, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Decode a full postings payload whose delta encoding restarts every
    ``block_size`` values (the on-disk layout from encode_term_postings).

    Segmented cumsum, fully vectorized: subtract, from the global running
    sum, the sum accumulated before each block's absolute restart value.
    """
    gaps = vb_decode(buf)
    n = gaps.size
    if n <= block_size:
        return delta_decode(gaps)
    cs = np.cumsum(gaps, dtype=np.uint64)
    starts = np.arange(block_size, n, block_size)
    base_per_block = np.concatenate(([np.uint64(0)], cs[starts - 1]))
    blk = np.arange(n, dtype=np.int64) // block_size
    return cs - base_per_block[blk]


# --- Spark-facing decoder (exhaustive query path) ----------------------------

def decode_postings_map():
    """mapInArrow factory: (term, doc_ids_vb, tfs_vb, doclens_vb) rows ->
    exploded (term, doc_id, tf, doclen) posting rows.

    r6: replaces the former pair of list-returning pandas UDFs + JVM
    ``explode(arrays_zip(...))`` — that shape round-tripped every payload
    through Arrow TWICE (decode out, exploded lists back) and
    materialized each decoded list as Python objects. Here the numpy
    decode output feeds the output RecordBatch directly (term strings
    repeated via one vectorized take), zero per-posting Python."""

    def fn(batches):
        import pyarrow as pa

        for rb in batches:
            idx = {n: i for i, n in enumerate(rb.schema.names)}
            terms = rb.column(idx["term"])
            ids_col = rb.column(idx["doc_ids_vb"])
            tfs_col = rb.column(idx["tfs_vb"])
            dls_col = rb.column(idx["doclens_vb"])
            ids_parts, tfs_parts, dls_parts, counts = [], [], [], []
            for i in range(rb.num_rows):
                ids = vb_decode_docids_blocked(
                    ids_col[i].as_py()).astype(np.int64)
                ids_parts.append(ids)
                tfs_parts.append(vb_decode(tfs_col[i].as_py()).astype(np.int64))
                dls_parts.append(vb_decode(dls_col[i].as_py()).astype(np.int64))
                counts.append(ids.size)
            if not counts:
                continue
            rep = np.repeat(np.arange(len(counts)), counts)
            yield pa.RecordBatch.from_arrays(
                [
                    terms.take(pa.array(rep)),
                    pa.array(np.concatenate(ids_parts), pa.int64()),
                    pa.array(np.concatenate(tfs_parts), pa.int64()),
                    pa.array(np.concatenate(dls_parts), pa.int64()),
                ],
                names=["term", "doc_id", "tf", "doclen"],
            )

    return fn
