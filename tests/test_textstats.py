"""Text analysis operators vs python oracles on the synthetic corpus."""

import re

import pytest
from pyspark.sql import functions as F

from nyu_search_engine_spark.functions.tokenize import tokenize_py
from nyu_search_engine_spark.operators import textstats


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog of doom"),
        (1, "el perro la casa de que los gatos es asi"),
        (2, "x = foo(1, 2); y += BAR_BAZ[3] !!!"),
        (3, ""),
        (4, "zzz qqq zzz qqq zzz 12345"),
    ]
    return spark.createDataFrame(rows, "id long, content string")


def test_token_stats(texts):
    out = {r["id"]: r for r in textstats.token_stats(texts, "id", "content").collect()}
    assert out[0]["n_tokens"] == len(tokenize_py("the quick brown fox and the lazy dog of doom"))
    assert out[0]["n_ws_tokens"] == 10
    assert out[3]["n_tokens"] == 0
    assert out[3]["avg_token_len"] == 0.0
    toks = tokenize_py("x = foo(1, 2); y += BAR_BAZ[3] !!!")
    assert out[2]["n_tokens"] == len(toks)
    assert abs(out[2]["avg_token_len"] - sum(map(len, toks)) / len(toks)) < 1e-9


def test_quality_scores(texts):
    out = {r["id"]: r for r in textstats.quality_scores(texts, "id", "content").collect()}
    s = "the quick brown fox and the lazy dog of doom"
    n = len(s)
    assert out[0]["n_chars"] == n
    assert abs(out[0]["alpha_ratio"] - len(re.sub(r"[^a-z]", "", s)) / n) < 1e-9
    assert out[0]["punct_ratio"] == 0.0
    toks = tokenize_py(s)
    stops = sum(t in textstats.STOPWORDS for t in toks)
    assert abs(out[0]["stopword_ratio"] - stops / len(toks)) < 1e-9
    assert out[3]["n_chars"] == 0
    assert out[4]["digit_ratio"] > 0


def test_lang_id(texts):
    out = {r["id"]: (r["lang_pred"], r["lang_score"]) for r in
           textstats.lang_id(texts, "id", "content").collect()}
    assert out[0][0] == "en"
    assert out[1][0] == "es"
    assert out[3] == ("und", 0)
    assert out[4] == ("und", 0)


def test_fingerprints(texts, spark):
    import hashlib

    out = {r["id"]: r for r in
           textstats.fingerprints(texts, "id", "content", 64, 5).collect()}
    s = "the quick brown fox and the lazy dog of doom"
    toks = tokenize_py(s)
    want_head = hashlib.md5(" ".join(toks[:64]).encode()).hexdigest()
    assert out[0]["fp_head"] == want_head
    want_min = min(
        hashlib.md5(" ".join(toks[i : i + 5]).encode()).hexdigest()
        for i in range(len(toks) - 4)
    )
    assert out[0]["fp_min_shingle"] == want_min
    # docs sharing a 5-token run can collide on fp_min_shingle; distinct docs here don't
    assert out[0]["fp_min_shingle"] != out[1]["fp_min_shingle"]


def test_fingerprint_detects_clones(spark, corpus):
    fp = textstats.fingerprints(corpus, "path", "content").toPandas()
    dup_heads = fp["fp_head"].value_counts()
    assert (dup_heads >= 3).any()  # the 3 planted clones share fp_head
