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


def test_tokens_tf_cols_agrees(spark):
    """The pure-JVM fused tokenize+tf (tokens_tf_cols) returns the same
    (sorted terms, tfs, doclen) as the Arrow UDF on goldens + null."""
    from collections import Counter

    from nyu_search_engine_spark.functions.tokenize import tokens_tf_cols

    texts = [t for t, _ in GOLDENS] + [None]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    got = df.select(tokens_tf_cols(F.col("content")).alias("tk")).collect()
    for text, row in zip(texts, got):
        toks = tokenize_py(text) if text is not None else []
        want = sorted(Counter(toks).items())
        assert list(zip(row["tk"]["terms"], row["tk"]["tfs"])) == want
        assert row["tk"]["doclen"] == len(toks)


def test_build_with_jvm_tf_tokenizer_rank_identical(spark, corpus, tmp_path):
    """An index built with tokenizer='jvm_tf' is byte-identical to the
    default Arrow build (same postings, same lexicon)."""
    import os

    from nyu_search_engine_spark.plans.build_index import build_index
    from nyu_search_engine_spark.sources import index_io

    a_root, b_root = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, corpus, a_root, shard_size=80, n_groups=2,
                parallel_groups=False, tokenizer="arrow")
    build_index(spark, corpus, b_root, shard_size=80, n_groups=2,
                parallel_groups=False, tokenizer="jvm_tf")

    def fp(root):
        df = index_io.read_postings(spark, root)
        return sorted(
            (r["shard"], r["term"], r["df"], bytes(r["doc_ids_vb"]).hex(),
             bytes(r["tfs_vb"]).hex(), bytes(r["doclens_vb"]).hex())
            for r in df.collect()
        )

    assert fp(a_root) == fp(b_root)


def test_tokenize_tf_batch_agrees_with_spec():
    """The r6 byte-level vectorized batch tokenizer (tokenize_tf_batch)
    must match tokenize_py + np.unique per doc — goldens (incl. the
    non-ASCII fallback trigger), empties at batch edges, and a synth
    corpus slice."""
    import numpy as np
    import pyarrow as pa

    from nyu_search_engine_spark.functions.tokenize import tokenize_tf_batch
    from nyu_search_engine_spark.synth import synth_corpus_pandas

    texts = (
        [t for t, _ in GOLDENS]
        + [None, "", "a" * 63 + "!", "KKelvin k"]  # U+212A lower->k
        + synth_corpus_pandas(200)["content"].tolist()
        + [""]
    )
    terms, tfs, doclen = tokenize_tf_batch(pa.array(texts, pa.string()))
    t_list, f_list = terms.to_pylist(), tfs.to_pylist()
    for i, text in enumerate(texts):
        toks = tokenize_py(text) if text is not None else []
        if toks:
            arr, counts = np.unique(
                np.asarray(toks, dtype=object), return_counts=True)
            want_t, want_f = list(arr), counts.astype(int).tolist()
        else:
            want_t, want_f = [], []
        assert t_list[i] == want_t, f"terms mismatch doc {i}: {text!r}"
        assert f_list[i] == want_f, f"tfs mismatch doc {i}"
        assert doclen[i] == len(toks)


def test_tokenize_tf_batch_doc_boundary_runs():
    """Token runs must never merge across adjacent documents (the raw
    Arrow buffer concatenates doc bytes with no separators)."""
    import pyarrow as pa

    from nyu_search_engine_spark.functions.tokenize import tokenize_tf_batch

    texts = ["abc", "def", "x1", "", "9z"]  # every boundary is tok|tok
    terms, tfs, doclen = tokenize_tf_batch(pa.array(texts, pa.string()))
    assert terms.to_pylist() == [["abc"], ["def"], ["x1"], [], ["9z"]]
    assert list(doclen) == [1, 1, 1, 0, 1]


def test_build_with_arrow_kernel_tokenizer_matches_jvm_tf(spark, corpus, tmp_path):
    """Index built via the mapInArrow tokenizer == jvm_tf build, byte-level."""
    from nyu_search_engine_spark.plans.build_index import build_index
    from nyu_search_engine_spark.sources import index_io

    a_root, b_root = str(tmp_path / "ka"), str(tmp_path / "kb")
    build_index(spark, corpus, a_root, shard_size=80, n_groups=2,
                parallel_groups=False, tokenizer="arrow")
    build_index(spark, corpus, b_root, shard_size=80, n_groups=2,
                parallel_groups=False, tokenizer="jvm_tf")

    def fp(root):
        df = index_io.read_postings(spark, root)
        return sorted(
            (r["shard"], r["term"], r["df"], bytes(r["doc_ids_vb"]).hex(),
             bytes(r["tfs_vb"]).hex(), bytes(r["doclens_vb"]).hex())
            for r in df.collect()
        )

    assert fp(a_root) == fp(b_root)
