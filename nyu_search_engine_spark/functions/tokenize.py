"""Tokenizer (SURVEY.md §2.2 P2/P3, pinned spec §8.1).

Reference locus: inverted-index/main:tokenizer (C++ worker threads,
/root/reference/README.md:6). Spec: lowercase, tokens = maximal runs of
[a-z0-9]+ (ASCII; everything else delimits), keep length 1..64, no
stemming, no stopwords.

Three interchangeable forms, golden-tested to agree:
  * ``tokens_col``    — pure Catalyst column expression (codegen, JVM-side)
  * ``tokenize_tf``   — Arrow-vectorized pandas UDF fusing tokenize + tf
                        count (P2+A1): one shuffled row per (doc, term)
                        instead of per token occurrence
  * ``duckdb_tokens_cte`` — the DuckDB-SQL twin used by every oracle
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import TOKEN_MATCH_RE, TOKEN_MAX_LEN, TOKEN_MIN_LEN, TOKEN_SPLIT_RE

_TOKEN_RE = re.compile(TOKEN_MATCH_RE)


def tokenize_py(content: str) -> list[str]:
    """Single-string tokenizer — the executable spec (tests, goldens)."""
    return [
        t
        for t in _TOKEN_RE.findall(content.lower())
        if TOKEN_MIN_LEN <= len(t) <= TOKEN_MAX_LEN
    ]


def tokens_col(content: Column) -> Column:
    """Pure column-expression tokenizer: array<string> of kept tokens."""
    return F.filter(
        F.split(F.lower(content), TOKEN_SPLIT_RE),
        lambda t: (F.length(t) >= TOKEN_MIN_LEN) & (F.length(t) <= TOKEN_MAX_LEN),
    )


_TF_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
        T.StructField("doclen", T.IntegerType(), False),
    ]
)


@F.pandas_udf(_TF_SCHEMA)
def tokenize_tf(content: pd.Series) -> pd.DataFrame:
    """Fused tokenize + per-doc tf count (P2+A1), Arrow-vectorized.

    Returns (terms sorted ascending, parallel tf array, doclen = total
    kept tokens). Sorted terms make downstream per-partition merges a
    pure streaming walk.
    """
    terms_out, tfs_out, dl_out = [], [], []
    for c in content:
        toks = tokenize_py(c if c is not None else "")
        if toks:
            arr, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            terms_out.append(arr.tolist())
            tfs_out.append(counts.astype("int32").tolist())
            dl_out.append(int(counts.sum()))
        else:
            terms_out.append([])
            tfs_out.append([])
            dl_out.append(0)
    return pd.DataFrame({"terms": terms_out, "tfs": tfs_out, "doclen": dl_out})


# --- byte-level vectorized tokenize+tf (r6, guide §4.2) ----------------------
# The pandas-UDF tokenizer paid a per-doc Python loop (regex findall +
# np.unique) plus object-list materialization on return. The build's docs
# stage now runs a mapInArrow pass whose kernel tokenizes a whole Arrow
# batch with numpy passes over the raw UTF-8 buffer: LUT lowercase, LUT
# token-class, run detection via class transitions, one gather of token
# bytes, dictionary-encode, and one np.unique over (doc, term-rank) keys
# for tf counts. Output list columns are built directly as Arrow arrays —
# zero per-token Python objects. Byte-exact with tokenize_py for pure
# ASCII input; any batch containing a non-ASCII byte falls back to the
# per-doc Python spec path (Unicode lowercasing can map non-ASCII chars
# INTO [a-z] — e.g. Kelvin sign -> k — which the byte path cannot see).

# docs per tokenize_tf_batch call from the map factory: bounds the
# kernel's per-call temporaries (token-byte gather indices) to a few MB
TOKENIZE_DOCS_PER_SLICE = 2048

_LUT_LOWER = np.arange(256, dtype=np.uint8)
_LUT_LOWER[ord("A"):ord("Z") + 1] += 32
_IS_TOKEN_BYTE = np.zeros(256, dtype=bool)
_IS_TOKEN_BYTE[ord("a"):ord("z") + 1] = True
_IS_TOKEN_BYTE[ord("0"):ord("9") + 1] = True


def _empty_token_lists(n: int):
    import pyarrow as pa

    zeros = np.zeros(n + 1, dtype=np.int32)
    terms = pa.ListArray.from_arrays(
        pa.array(zeros, pa.int32()), pa.array([], pa.string()))
    tfs = pa.ListArray.from_arrays(
        pa.array(zeros, pa.int32()), pa.array([], pa.int32()))
    return terms, tfs, np.zeros(n, dtype=np.int32)


def _tokenize_tf_python_batch(strs: list):
    """Per-doc spec path (non-ASCII fallback): tokenize_py + np.unique,
    assembled into the same Arrow list columns as the fast path."""
    import pyarrow as pa

    terms_flat: list[str] = []
    tfs_flat: list[int] = []
    offs = np.zeros(len(strs) + 1, dtype=np.int32)
    doclen = np.zeros(len(strs), dtype=np.int32)
    for i, c in enumerate(strs):
        toks = tokenize_py(c if c is not None else "")
        if toks:
            arr, counts = np.unique(
                np.asarray(toks, dtype=object), return_counts=True)
            terms_flat.extend(arr.tolist())
            tfs_flat.extend(counts.astype("int64").tolist())
            doclen[i] = int(counts.sum())
        offs[i + 1] = len(terms_flat)
    terms = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pa.array(terms_flat, pa.string()))
    tfs = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()),
        pa.array(np.asarray(tfs_flat, dtype=np.int32), pa.int32()))
    return terms, tfs, doclen


def tokenize_tf_batch(arr):
    """One Arrow StringArray of documents -> (terms list<string> sorted
    ASC, tfs list<int32>, doclen int32 ndarray). The vectorized twin of
    ``tokenize_tf``'s row semantics (golden-tested to agree)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return _empty_token_lists(0)
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    bufs = arr.buffers()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0]:offs[-1]]
    offs = offs - offs[0]
    if data.size == 0:
        return _empty_token_lists(n)
    if data.max() >= 0x80:  # non-ASCII anywhere: take the spec path
        return _tokenize_tf_python_batch(arr.to_pylist())

    lb = _LUT_LOWER[data]
    tok = _IS_TOKEN_BYTE[lb]
    # maximal token runs from class transitions (2 passes over the buffer)
    trans = np.flatnonzero(tok[1:] != tok[:-1]) + 1
    bounds = np.concatenate(([0], trans, [tok.size]))
    is_tok_seg = tok[bounds[:-1]]
    starts = bounds[:-1][is_tok_seg]
    ends = bounds[1:][is_tok_seg]
    # document boundaries delimit tokens: split any run crossing one
    inner = offs[1:-1]
    if inner.size:
        si = np.searchsorted(starts, inner, side="right") - 1
        si_ok = si >= 0
        # unique: consecutive empty docs repeat a boundary offset, and a
        # duplicated cut would fabricate a zero-length token
        cut = np.unique(inner[si_ok & (inner > starts[np.maximum(si, 0)])
                              & (inner < ends[np.maximum(si, 0)])])
        if cut.size:
            starts = np.sort(np.concatenate([starts, cut]))
            ends = np.sort(np.concatenate([ends, cut]))
    lens = ends - starts
    keep = (lens >= TOKEN_MIN_LEN) & (lens <= TOKEN_MAX_LEN)
    starts, lens = starts[keep], lens[keep]
    if starts.size == 0:
        return _empty_token_lists(n)
    doc_of = np.searchsorted(offs, starts, side="right") - 1
    # gather token bytes into one contiguous buffer -> Arrow StringArray.
    # int32 index math: the per-call buffer is bounded (the map factory
    # slices batches) and 8-byte index temporaries at full batch size
    # measurably blew the sandbox host's fast-backing watermark (sys-time
    # minor-fault storm across 16 workers).
    new_off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    src = np.repeat((starts - new_off[:-1]).astype(np.int32), lens)
    src += np.arange(int(new_off[-1]), dtype=np.int32)
    tok_bytes = lb[src]
    tok_arr = pa.Array.from_buffers(
        pa.utf8(), starts.size,
        [None, pa.py_buffer(new_off.astype(np.int32)),
         pa.py_buffer(tok_bytes)])
    denc = tok_arr.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = denc.dictionary
    nd = len(dictionary)
    order = pc.sort_indices(dictionary).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rank = np.empty(max(nd, 1), dtype=np.int64)
    rank[order] = np.arange(nd)
    # tf = multiplicity of each (doc, term) pair; unique keys come out
    # sorted, i.e. per-doc term lists sorted by rank == bytewise ASC
    key = doc_of * nd + rank[codes]
    ukey, counts = np.unique(key, return_counts=True)
    udoc = ukey // nd
    per_doc = np.bincount(udoc, minlength=n)
    goffs = np.concatenate(([0], np.cumsum(per_doc))).astype(np.int32)
    term_vals = dictionary.take(pa.array(order)).take(pa.array(ukey % nd))
    terms = pa.ListArray.from_arrays(pa.array(goffs, pa.int32()), term_vals)
    tfs = pa.ListArray.from_arrays(
        pa.array(goffs, pa.int32()),
        pa.array(counts.astype(np.int32), pa.int32()))
    doclen = np.bincount(doc_of, minlength=n).astype(np.int32)
    return terms, tfs, doclen


def tokenize_tf_map(passthrough: list[str], content_col: str = "content"):
    """mapInArrow factory for the build's docs stage: batches with
    ``passthrough`` columns + ``content_col`` -> passthrough + (terms,
    tfs, doclen). Content never crosses back; list columns are emitted as
    Arrow arrays with no per-token Python objects."""

    def fn(batches):
        import pyarrow as pa

        for rb in batches:
            idx = {name: i for i, name in enumerate(rb.schema.names)}
            # sub-slice: bound the kernel's gather temporaries per call
            # (N workers x full-batch temporaries measurably crossed the
            # host memory watermark -> sys-bound minor faults)
            for lo in range(0, rb.num_rows, TOKENIZE_DOCS_PER_SLICE):
                sl = rb.slice(lo, TOKENIZE_DOCS_PER_SLICE)
                terms, tfs, doclen = tokenize_tf_batch(
                    sl.column(idx[content_col]))
                cols = [sl.column(idx[c]) for c in passthrough]
                yield pa.RecordBatch.from_arrays(
                    cols + [terms, tfs, pa.array(doclen, pa.int32())],
                    names=passthrough + ["terms", "tfs", "doclen"],
                )

    return fn


def tokens_tf_cols(content: Column) -> Column:
    """Fused tokenize + tf ENTIRELY JVM-side (no Python at all): sort the
    token array, find run starts, and diff consecutive run starts into
    counts. Returns struct(terms array<string>, tfs array<int>, doclen int)
    with the same (terms sorted ASC, parallel tfs) contract as
    ``tokenize_tf`` — tokens are pure ASCII [a-z0-9]+, so Spark's binary
    string sort and numpy's object sort agree. The third arm of the
    tokenizer A/B (VERDICT r2 #5).

    Expression-shape note: higher-order functions are interpreted (no
    whole-stage codegen), so any expression inside a lambda body is
    RE-EVALUATED per array element. The first version referenced the
    sorted token array directly inside the run-start lambda, turning each
    row into O(doclen) re-sorts — O(doclen^2 log doclen) per document,
    unfinishable at 1M docs. The sorted array and the run-start array are
    therefore bound as lambda VARIABLES via single-element
    transform(array(x), v -> ...) wrappers: each is computed once per row
    and lambda bodies only do O(1) element_at lookups against them.
    """
    def with_starts(ts: Column, starts: Column) -> Column:
        n = F.size(ts)
        nexts = F.concat(
            F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
            F.array(n),
        )
        return F.struct(
            F.transform(starts, lambda i: F.element_at(ts, i + 1)).alias("terms"),
            F.zip_with(starts, nexts, lambda a, b: (b - a).cast("int")).alias("tfs"),
            n.alias("doclen"),
        )

    empty = F.struct(
        F.array().cast("array<string>").alias("terms"),
        F.array().cast("array<int>").alias("tfs"),
        F.lit(0).alias("doclen"),
    )

    def body(ts: Column) -> Column:
        # 0-based run-start positions: i == 0 or ts[i-1] != ts[i]
        starts = F.filter(
            F.sequence(F.lit(0), F.size(ts) - 1),
            lambda i: (i == F.lit(0))
            | (F.element_at(ts, i) != F.element_at(ts, i + 1)),
        )
        return F.when(
            F.size(ts) > 0,
            F.element_at(
                F.transform(F.array(starts), lambda s: with_starts(ts, s)), 1
            ),
        ).otherwise(empty)

    return F.element_at(
        F.transform(F.array(F.array_sort(tokens_col(content))), body), 1
    )


def duckdb_tokens_cte(doc_expr: str, content_expr: str, relation: str) -> str:
    """DuckDB CTE body yielding (doc, term) one row per kept occurrence.

    Semantics identical to ``tokenize_py``: regexp-split on non-[a-z0-9],
    drop empties and over-long tokens.
    """
    return f"""
        SELECT {doc_expr} AS doc, t.term AS term
        FROM {relation},
             unnest(regexp_split_to_array(lower({content_expr}), '[^a-z0-9]+'))
               AS t(term)
        WHERE t.term <> '' AND length(t.term) BETWEEN {TOKEN_MIN_LEN} AND {TOKEN_MAX_LEN}
    """
