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
