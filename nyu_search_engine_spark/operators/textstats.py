"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All deterministic, all pure column expressions (JVM-side) so each has an
exact DuckDB oracle. Heuristics are pinned specs, not ML models — at
100 TB you want cheap, reproducible, explainable filters in front of the
expensive stages.

r6: every operator evaluates the tokenizer ONCE per row. Higher-order
expressions are interpreted (no codegen / no common-subexpression
elimination), so a projection that references ``tokens_col`` N times
re-tokenizes N times — measured 1.7x on quality_scores. The ``_bind``
helper feeds the token array to the operator body as a lambda variable
(the same trick as ``tokens_tf_cols``); outputs are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

# pinned marker vocabularies for the n-gram-free language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "de", "que", "los", "es"),
    "fr": ("le", "la", "les", "de", "et", "est"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
}
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is")


def _bind(col: Column, body) -> Column:
    """Evaluate ``col`` once per row and pass it to ``body`` as a lambda
    variable via a single-element transform — the binding idiom that
    stops interpreted projections from re-evaluating the expression per
    reference."""
    return F.element_at(F.transform(F.array(col), body), 1)


def token_stats(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(id, n_tokens, n_ws_tokens, avg_token_len) — engine-tokenizer count,
    whitespace count, mean kept-token length."""
    ws = F.filter(F.split(F.col(content_col), r"\s+"), lambda t: t != "")

    def body(toks: Column) -> Column:
        return F.struct(
            F.size(toks).alias("n_tokens"),
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t).cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ) / F.size(toks),
            ).otherwise(F.lit(0.0)).alias("avg_token_len"),
        )

    tk = _bind(tokens_col(F.col(content_col)), body)
    return df.select(
        F.col(id_col).alias("id"),
        tk["n_tokens"].alias("n_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        tk["avg_token_len"].alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(id, n_chars, alpha_ratio, digit_ratio, punct_ratio, stopword_ratio,
    uniq_token_ratio) — pinned length/char-class/stopword heuristics."""
    c = F.lower(F.col(content_col))
    n = F.length(c).cast("double")

    def class_ratio(pattern: str):
        return F.when(
            n > 0, F.length(F.regexp_replace(c, pattern, "")) / n
        ).otherwise(F.lit(0.0))

    def body(toks: Column) -> Column:
        n_toks = F.size(toks)
        stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
        return F.struct(
            F.when(n_toks > 0, stop_hits / n_toks)
            .otherwise(F.lit(0.0)).alias("stopword_ratio"),
            F.when(n_toks > 0, F.size(F.array_distinct(toks)) / n_toks)
            .otherwise(F.lit(0.0)).alias("uniq_token_ratio"),
        )

    tk = _bind(tokens_col(F.col(content_col)), body)
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_chars"),
        class_ratio(r"[^a-z]").alias("alpha_ratio"),
        class_ratio(r"[^0-9]").alias("digit_ratio"),
        class_ratio(r"[a-z0-9\s]").alias("punct_ratio"),
        tk["stopword_ratio"].alias("stopword_ratio"),
        tk["uniq_token_ratio"].alias("uniq_token_ratio"),
    )


def lang_id(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(id, lang_pred, lang_score) — argmax of per-language marker hit
    counts; deterministic tie-break by language code ASC; 'und' if zero."""

    def body(toks: Column) -> Column:
        scores = [
            F.struct(
                (-F.size(F.filter(toks, lambda t: t.isin(*markers))))
                .alias("neg"),
                F.lit(lang).alias("lang"),
            )
            for lang, markers in sorted(LANG_MARKERS.items())
        ]
        return F.array_min(F.array(*scores))

    best = _bind(tokens_col(F.col(content_col)), body)
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        (-best["neg"]).cast("long").alias("lang_score"),
    )


def fingerprints(
    df: DataFrame, id_col: str, content_col: str,
    head_n: int = 64, shingle_n: int = 5,
) -> DataFrame:
    """(id, fp_head, fp_min_shingle) — md5 of the first head_n tokens, and
    the winnowing-style minimum md5 over shingle_n-gram shingles (equal
    fp_min_shingle => docs share at least one n-token run, cheap near-dup
    prefilter)."""

    def body(toks: Column) -> Column:
        head = F.md5(F.concat_ws(" ", F.slice(toks, 1, head_n)))
        sh = F.when(
            F.size(toks) >= shingle_n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - shingle_n),
                lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, shingle_n))),
            ),
        ).otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
        return F.struct(
            head.alias("fp_head"), F.array_min(sh).alias("fp_min_shingle")
        )

    tk = _bind(tokens_col(F.col(content_col)), body)
    return df.select(
        F.col(id_col).alias("id"),
        tk["fp_head"].alias("fp_head"),
        tk["fp_min_shingle"].alias("fp_min_shingle"),
    )
