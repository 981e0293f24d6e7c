"""Tokenizer goldens (§8.1) + agreement of all four implementations:
tokenize_py (spec), tokens_col (Catalyst), tokenize_tf (Arrow UDF),
duckdb_tokens_cte (oracle twin)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nyu_search_engine_spark.functions.tokenize import (
    duckdb_tokens_cte,
    tokenize_py,
    tokenize_tf,
    tokens_col,
)

GOLDENS = [
    ("def foo_bar(x): return x+1", ["def", "foo", "bar", "x", "return", "x", "1"]),
    ("HashMap<String, Int>", ["hashmap", "string", "int"]),
    ("", []),
    ("...;;;(((", []),
    ("CamelCase MIXED123case", ["camelcase", "mixed123case"]),
    ("héllo wörld", ["h", "llo", "w", "rld"]),  # non-ASCII delimits
    ("a" * 64 + " " + "b" * 65, ["a" * 64]),  # 65-char token dropped
    ("x\ty\nz", ["x", "y", "z"]),
    ("0x1F 42", ["0x1f", "42"]),
]


@pytest.mark.parametrize("text,want", GOLDENS)
def test_tokenize_py_goldens(text, want):
    assert tokenize_py(text) == want


def test_tokens_col_agrees(spark):
    texts = [t for t, _ in GOLDENS]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    got = [r["toks"] for r in df.select(tokens_col(F.col("content")).alias("toks")).collect()]
    assert got == [tokenize_py(t) for t in texts]


def test_tokenize_tf_agrees(spark):
    texts = [t for t, _ in GOLDENS]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    rows = df.select(tokenize_tf("content").alias("tk")).collect()
    for text, r in zip(texts, rows):
        toks = tokenize_py(text)
        want = sorted(set(toks))
        assert list(r["tk"]["terms"]) == want
        assert r["tk"]["doclen"] == len(toks)
        assert sum(r["tk"]["tfs"]) == len(toks)
        for term, tf in zip(r["tk"]["terms"], r["tk"]["tfs"]):
            assert tf == toks.count(term)


def test_duckdb_cte_agrees(corpus_pdf):
    con = duckdb.connect()
    con.register("c", corpus_pdf.assign(rid=range(len(corpus_pdf))))
    got = con.sql(
        f"SELECT doc, term FROM ({duckdb_tokens_cte('rid', 'content', 'c')}) ORDER BY doc, term"
    ).df()
    want_rows = []
    for rid, content in enumerate(corpus_pdf["content"]):
        want_rows += [(rid, t) for t in tokenize_py(content)]
    want = pd.DataFrame(want_rows, columns=["doc", "term"]).sort_values(
        ["doc", "term"]
    ).reset_index(drop=True)
    got = got.sort_values(["doc", "term"]).reset_index(drop=True)
    assert (got["doc"].to_numpy() == want["doc"].to_numpy()).all()
    assert (got["term"].to_numpy() == want["term"].to_numpy()).all()
