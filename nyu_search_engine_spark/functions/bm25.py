"""BM25 scoring (SURVEY.md §2.8 F6/F7, pinned spec §8.3).

Reference locus: query-processor/main:score (/root/reference/README.md:7).
k1 = 1.2, b = 0.75, idf = max(0, ln((N - df + 0.5)/(df + 0.5))) (RSJ, no +1,
floored so stopword-grade hot terms never score negative).

Two twins of the same formula, pinned to the same constants module:
  * column expressions (Catalyst, whole-stage-codegen'd) — exhaustive path
  * numpy kernels — the block-max-WAND pruned mapInPandas kernel
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import BM25_B, BM25_K1


# --- Catalyst column expressions -------------------------------------------

def idf_col(df_col: Column, n_docs: Column | int) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    raw = F.log((n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))
    return F.greatest(raw, F.lit(0.0))


def tf_part_col(tf_col: Column, doclen_col: Column, avgdl: Column | float) -> Column:
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    return (tf_col * F.lit(BM25_K1 + 1.0)) / (
        tf_col + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * doclen_col / a)
    )


def score_col(tf_col: Column, doclen_col: Column, df_col: Column,
              n_docs: Column | int, avgdl: Column | float) -> Column:
    return idf_col(df_col, n_docs) * tf_part_col(tf_col, doclen_col, avgdl)


# --- numpy twins (pruned kernel, block-max precompute) ----------------------

def idf_np(df: float, n_docs: float) -> float:
    return max(0.0, float(np.log((n_docs - df + 0.5) / (df + 0.5))))


def tf_part_np(tf: np.ndarray, doclen: np.ndarray, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    return (tf * (BM25_K1 + 1.0)) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * doclen.astype(np.float64) / avgdl)
    )


# --- DuckDB oracle SQL fragments --------------------------------------------

def duckdb_idf_sql(df_expr: str, n_expr: str) -> str:
    return f"greatest(ln(({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5)), 0.0)"


def duckdb_tf_part_sql(tf_expr: str, doclen_expr: str, avgdl_expr: str) -> str:
    return (
        f"({tf_expr} * {BM25_K1 + 1.0}) / "
        f"({tf_expr} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * {doclen_expr} / {avgdl_expr}))"
    )
