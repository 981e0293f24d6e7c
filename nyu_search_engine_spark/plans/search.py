"""Query engine (SURVEY.md §3.2).

Reference locus: query-processor/main (/root/reference/README.md:7) — a C++
REPL doing lexicon probe -> rarest-first DAAT -> block-max-WAND BM25 -> top-k
min-heap. Here the same semantics are expressed three ways, rank-identical
by construction (pytest-enforced, BASELINE.json north_star):

  * ``bruteforce_topk``   — no index at all: tokenize + column-expression
                            BM25 + TakeOrderedAndProject. The permanent
                            exhaustive oracle (M1, path 3a-noindex).
  * ``search_exhaustive`` — index-backed, decode + explode + hash agg
                            (plans/search_index.py).
  * ``search_pruned``     — index-backed, per-shard BMW DAAT kernel
                            (plans/search_index.py).

Determinism rule for float scores: per-term partials are summed in
rarest-first (df ASC, term ASC) order in EVERY path — via a sorted-array
``F.aggregate`` fold here and an identically-ordered numpy loop in the
kernel — so engineered ties are exactly equal and the §8.3 tie-break
(score DESC, doc ASC) yields identical ranks everywhere.
"""

from __future__ import annotations

import weakref
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import DEFAULT_TOP_K
from ..functions.bm25 import score_col
from ..functions.tokenize import tokenize_py, tokenize_tf


@dataclass(frozen=True)
class Query:
    """A parsed query (SURVEY.md §1 #7). mode: 'AND' (conjunctive) or 'OR'."""

    terms: tuple[str, ...]
    mode: str = "OR"
    k: int = DEFAULT_TOP_K

    def __post_init__(self):
        if self.mode not in ("AND", "OR"):
            raise ValueError(f"mode must be AND or OR, got {self.mode!r}")

    @staticmethod
    def parse(line: str, mode: str = "OR", k: int = DEFAULT_TOP_K) -> "Query":
        """Tokenize a raw query line with the corpus tokenizer (§8.1) and
        dedupe terms (posting lists are sets keyed by docID)."""
        seen: dict[str, None] = {}
        for t in tokenize_py(line):
            seen.setdefault(t, None)
        return Query(terms=tuple(seen), mode=mode, k=k)


def _rank_window() -> Window:
    # Window over the <= k post-limit rows. Catalyst constant-folds any
    # foldable partition key to an empty spec, so WindowExec's "No
    # Partition Defined" warning is unavoidable in the lazy form — and
    # HONEST: all rows do move to one partition, which is exactly k rows
    # by construction (bounded, benign). Kept lazy so the plan-shape
    # tests can see the TakeOrderedAndProject + Arrow tokenizer nodes;
    # the latency-critical index path ranks driver-side instead
    # (plans/search_index.py _rank).
    return Window.orderBy(
        F.desc("score"), F.col("repo"), F.col("path"), F.col("commit")
    )


def bruteforce_topk(corpus: DataFrame, query: Query) -> DataFrame:
    """Index-free exhaustive BM25 top-k over the raw corpus.

    Plan shape (all Catalyst built-ins after the one Arrow tokenizer UDF):
    scan -> ArrowEval(tokenize_tf) -> explode -> IN-filter -> broadcast df
    join -> per-doc sorted fold -> TakeOrderedAndProject(k).
    """
    terms = list(dict.fromkeys(query.terms))
    if not terms:
        return _empty_result(corpus)

    tk = corpus.select(
        "repo", "path", "commit", tokenize_tf("content").alias("tk")
    ).select(
        "repo", "path", "commit",
        F.col("tk.doclen").alias("doclen"),
        F.explode(F.arrays_zip("tk.terms", "tk.tfs")).alias("p"),
    ).select(
        "repo", "path", "commit", "doclen",
        F.col("p.terms").alias("term"),
        F.col("p.tfs").alias("tf").cast("int"),
    )
    # corpus stats (N, avgdl) — tiny driver round-trip, broadcast into exprs
    n_docs, avgdl = _corpus_stats(corpus)

    postings = tk.filter(F.col("term").isin(terms))
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    scored = postings.join(F.broadcast(dfreq), "term").withColumn(
        "partial",
        score_col(F.col("tf"), F.col("doclen"), F.col("df"), n_docs, avgdl),
    )
    per_doc = scored.groupBy("repo", "path", "commit").agg(
        F.count("*").alias("n_terms"),
        # deterministic rarest-first (df ASC, term ASC) float64 fold
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("df", "term", "partial"))
                ),
                lambda x: x["partial"],
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    if query.mode == "AND":
        per_doc = per_doc.filter(F.col("n_terms") == len(terms))
    topk = (
        per_doc.orderBy(
            F.desc("score"), "repo", "path", "commit"
        ).limit(query.k)
    )
    return topk.select(
        F.row_number().over(_rank_window()).alias("rank"),
        "repo", "path", "commit",
        F.col("score").cast("double").alias("score"),
    )


_STATS_CACHE: "weakref.WeakKeyDictionary[DataFrame, tuple[int, float]]" = (
    weakref.WeakKeyDictionary()
)


def _corpus_stats(corpus: DataFrame) -> tuple[int, float]:
    """(N, avgdl) for BM25 — memoized per corpus DataFrame so repeated
    bruteforce queries over the same corpus tokenize it for stats once,
    not once per query."""
    hit = _STATS_CACHE.get(corpus)
    if hit is not None:
        return hit
    row = (
        corpus.select(tokenize_tf("content").alias("tk"))
        .agg(
            F.count("*").alias("n"),
            F.avg(F.col("tk.doclen")).alias("avgdl"),
        )
        .first()
    )
    out = (int(row["n"]), float(row["avgdl"]))
    _STATS_CACHE[corpus] = out
    return out


def _empty_result(corpus: DataFrame) -> DataFrame:
    return corpus.sparkSession.createDataFrame(
        [],
        "rank int, repo string, path string, commit string, score double",
    )
