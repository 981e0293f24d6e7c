"""Posting-list assembly (SURVEY.md §2.4 A4/A5/A7 + §2.6 T1/T2).

Reference locus: inverted-index/main:spiller+merger — memory-budgeted sorted
temp runs, then a k-way heap merge producing per-term compressed lists
(/root/reference/README.md:6). In Spark the spill-sort-merge is the
sort-based shuffle itself: ``repartition(shard) + sortWithinPartitions
(shard, term, doc_id)`` feeds this kernel one globally-grouped sorted
stream per partition, and the kernel walks it emitting one compressed row
per (shard, term).

Skew (A7): the shard IS the salt. ``shard = doc_id // SHARD_SIZE`` bounds
every (shard, term) group at SHARD_SIZE postings, so a stopword-grade hot
term can never concentrate on one reducer no matter the corpus size; the
"post-merge" is the lexicon aggregation (tiny rows) plus the query-time
per-shard fan-out. No collect_list anywhere — the walk streams Arrow
batches with a carry buffer.

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
import pandas as pd

from ..constants import BLOCK_SIZE
from ..functions.bm25 import tf_part_np
from ..functions.varbyte import delta_encode, vb_encode, vb_nbytes

POSTINGS_SCHEMA = (
    "shard int, term string, df int, cf long, max_tfn float, "
    "doc_ids_vb binary, tfs_vb binary, doclens_vb binary, "
    "blocks array<struct<last_doc_id: long, max_tfn: float, "
    "off_ids: int, off_tfs: int, off_dls: int>>"
)


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

    Fully vectorized: each payload is ONE vb_encode call; per-block delta
    restart is expressed as "gap array with absolute values at block
    starts", and block byte offsets come from the per-value byte-count
    cumsum — identical bytes to encoding each block separately.
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


def assemble_postings(avgdl: float, occurrences: bool = False):
    """mapInPandas factory: sorted partition stream -> one row per
    (shard, term).

    occurrences=False: input rows are (shard, term, doc_id, tf, doclen) —
    one per (doc, term), tf pre-counted (Arrow tokenizer path).
    occurrences=True: input rows are (shard, term, doc_id, doclen) — one
    per token OCCURRENCE (JVM tokenizer path); the kernel collapses equal
    (term, doc_id) runs into tf counts, keeping the whole docs stage
    Python-free (tokens come from a codegen'd regexp split).
    """

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            shard = pdf["shard"].to_numpy()
            term = pdf["term"].to_numpy()
            # boundaries where (shard, term) changes
            chg = np.nonzero((shard[1:] != shard[:-1]) | (term[1:] != term[:-1]))[0] + 1
            if chg.size == 0:  # whole batch is one (possibly partial) group
                carry = pdf
                continue
            last_start = int(chg[-1])
            carry = pdf.iloc[last_start:].reset_index(drop=True)
            yield _emit_groups(pdf.iloc[:last_start], avgdl, occurrences)
        if carry is not None and len(carry):
            yield _emit_groups(carry, avgdl, occurrences)

    return walk


def _emit_groups(
    pdf: pd.DataFrame, avgdl: float, occurrences: bool = False
) -> pd.DataFrame:
    shard = pdf["shard"].to_numpy()
    term = pdf["term"].to_numpy()
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    dls = pdf["doclen"].to_numpy(dtype=np.int64)
    tfs = None if occurrences else pdf["tf"].to_numpy(dtype=np.int64)
    starts = np.concatenate(
        ([0], np.nonzero((shard[1:] != shard[:-1]) | (term[1:] != term[:-1]))[0] + 1)
    )
    ends = np.concatenate((starts[1:], [len(pdf)]))
    rows = []
    for s, e in zip(starts, ends):
        if occurrences:
            # doc_ids sorted within the group: equal runs == one doc's tf
            u, first, cnt = np.unique(
                ids[s:e], return_index=True, return_counts=True
            )
            row = encode_term_postings(
                u, cnt.astype(np.int64), dls[s:e][first], avgdl
            )
        else:
            row = encode_term_postings(ids[s:e], tfs[s:e], dls[s:e], avgdl)
        row["shard"] = int(shard[s])
        row["term"] = term[s]
        rows.append(row)
    return pd.DataFrame(
        rows,
        columns=[
            "shard", "term", "df", "cf", "max_tfn",
            "doc_ids_vb", "tfs_vb", "doclens_vb", "blocks",
        ],
    )
