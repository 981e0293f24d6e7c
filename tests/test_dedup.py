"""Dedup operators: exact groups find the planted clones; MinHash-LSH
recalls the exact-Jaccard pairs; SimHash of identical docs is identical;
n-gram Jaccard matches a brute-force python oracle."""

import itertools

import numpy as np
from pyspark.sql import functions as F

from nyu_search_engine_spark.functions.tokenize import tokenize_py, tokens_col
from nyu_search_engine_spark.operators import dedup
from tests.conftest import N_DOCS


def _tok_df(corpus):
    return corpus.select(
        F.concat_ws("|", "repo", "path").alias("doc_key"),
        tokens_col(F.col("content")).alias("tokens"),
    ).withColumnRenamed("doc_key", "id").select(
        F.col("id"), F.col("tokens")
    )


def test_exact_dup_groups_find_clones(spark, corpus):
    out = dedup.exact_dup_groups(corpus, "path", "content").toPandas()
    grp = out[out["group_size"] > 1]
    # synth corpus clones the last 3 docs
    assert sorted(grp["id"]) == sorted(
        f"src/d{i % 13}/f_{i}.{['py','cpp','java','rs','go'][i % 5]}"
        for i in (N_DOCS - 3, N_DOCS - 2, N_DOCS - 1)
    )
    assert (grp["group_size"] == 3).all()
    assert grp["canonical_id"].nunique() == 1


def _python_jaccard_pairs(corpus_pdf, n, threshold):
    sh = {}
    for _, r in corpus_pdf.iterrows():
        toks = tokenize_py(r["content"])
        key = f"{r['repo']}|{r['path']}"
        if len(toks) >= n:
            sh[key] = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        else:
            sh[key] = {" ".join(toks)}
    pairs = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter:
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= threshold:
                pairs[(a, b)] = j
    return pairs


def test_ngram_jaccard_matches_python_oracle(spark, corpus, corpus_pdf):
    toks = corpus.select(
        F.concat_ws("|", "repo", "path").alias("id"),
        tokens_col(F.col("content")).alias("tokens"),
    )
    sh = dedup.shingles(toks, "id", "tokens", 3)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(sh, 0.8).collect()
    }
    want = _python_jaccard_pairs(corpus_pdf, 3, 0.8)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_minhash_lsh_recalls_exact_dups(spark, corpus, corpus_pdf):
    toks = corpus.select(
        F.concat_ws("|", "repo", "path").alias("id"),
        tokens_col(F.col("content")).alias("tokens"),
    )
    sh = dedup.shingles(toks, "id", "tokens", 3)
    sigs = dedup.minhash_signatures(sh, 16)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(sigs, 4, 4).collect()
    }
    # identical docs have identical signatures in every band -> must be found
    exact = set(_python_jaccard_pairs(corpus_pdf, 3, 0.999))
    assert exact, "expected planted clone pairs"
    assert exact <= pairs


def test_minhash_similarity_estimates_jaccard(spark, corpus, corpus_pdf):
    toks = corpus.select(
        F.concat_ws("|", "repo", "path").alias("id"),
        tokens_col(F.col("content")).alias("tokens"),
    )
    sigs = dedup.minhash_signatures(
        dedup.shingles(toks, "id", "tokens", 3), 64
    ).toPandas().set_index("id")["sig"]
    want = _python_jaccard_pairs(corpus_pdf, 3, 0.0)
    checked = 0
    for (a, b), j in want.items():
        if j >= 0.9 or 0.01 < j < 0.1:
            est = np.mean(
                [x == y for x, y in zip(sigs[a], sigs[b])]
            )
            assert abs(est - j) < 0.25
            checked += 1
    assert checked > 0


def test_simhash_identical_docs_equal(spark, corpus):
    toks = corpus.select(F.col("path").alias("id"),
                         F.explode(tokens_col(F.col("content"))).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    out = dedup.simhash(tf).toPandas().set_index("id")["simhash"]
    exts = ["py", "cpp", "java", "rs", "go"]
    clones = [
        f"src/d{i % 13}/f_{i}.{exts[i % 5]}" for i in (N_DOCS - 3, N_DOCS - 2, N_DOCS - 1)
    ]
    vals = {out[c] for c in clones}
    assert len(vals) == 1
    assert all(v >= 0 for v in out)


def test_simhash_single_exchange(spark):
    # the fingerprint is ONE groupBy(id) of conditional sums — no crossJoin
    # row blow-up, no second shuffle (VERDICT r2 #4)
    tf = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 1), (2, "a", 2)], "id long, term string, tf long"
    )
    plan = dedup.simhash(tf)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_embedding_neardup_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vid long, v array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_neardup_pairs(emb, "vid", "v", 0.95).collect()
    }
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] > 0.999


def test_embedding_neardup_lsh_pairs_subset_and_exact(spark):
    """The bucketed scale path emits a SUBSET of the exact O(n^2) pairs
    (blocking can only lose pairs, never invent them), with identical
    cosines on every emitted pair, and must catch near-identical vectors
    (which always share a bucket)."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((120, 16))
    vecs[1] = vecs[0] + rng.standard_normal(16) * 0.01   # planted near-dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vid long, v array<float>")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_neardup_pairs(emb, "vid", "v", 0.5).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_neardup_lsh_pairs(
            emb, "vid", "v", 0.5, n_planes=4
        ).collect()
    }
    assert set(blocked) <= set(exact)
    assert (0, 1) in blocked
    for pair, cos in blocked.items():
        assert abs(cos - exact[pair]) < 1e-12


def _py_components(edges):
    """Union-find oracle: {node: min id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    # adversarial shapes: a long descending path (forces multiple star
    # rounds), a cycle, a dense clique, crossing chains, and self/dup edges
    edges = (
        [(i + 1, i) for i in range(10, 20)]          # path 10-...-20
        + [(1, 2), (2, 3), (3, 1)]                   # cycle
        + [(a, b) for a in (30, 31, 32, 33) for b in (30, 31, 32, 33) if a < b]
        + [(40, 50), (50, 41), (41, 51), (51, 40)]   # crossing chains
        + [(60, 60), (61, 62), (62, 61)]             # self loop + dup both ways
    )
    exp = _py_components(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    # self-loop-only nodes carry no edges after cleaning -> absent
    exp.pop(60, None)
    assert got == exp


def test_neardup_clusters_labels_every_doc_with_sizes(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (6, 7)], "id_a long, id_b long"
    )
    out = {
        r["id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup.neardup_clusters(pairs, docs, "doc_id").collect()
    }
    assert out == {
        0: (0, 3), 3: (0, 3), 5: (0, 3),      # glued cluster
        6: (6, 2), 7: (6, 2),                 # pair cluster
        1: (1, 1), 2: (2, 1), 4: (4, 1),      # singletons
    }


def test_neardup_clusters_empty_pairs_all_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup.neardup_clusters(pairs, docs, "doc_id").collect()
    assert all(r["cluster_id"] == r["id"] and r["cluster_size"] == 1
               for r in out)
    assert len(out) == 4


def test_simhash_pairs_complete_vs_bruteforce(spark, corpus):
    """Pigeonhole banding is a COMPLETE candidate generator for
    hamming <= k — the operator must return exactly the brute-force
    all-pairs answer, not a recall-bounded subset."""
    tf = (
        corpus.select(
            F.concat_ws("|", "repo", "path").alias("id"),
            F.explode(tokens_col(F.col("content"))).alias("term"),
        ).groupBy("id", "term").agg(F.count("*").alias("tf"))
    )
    fp = dedup.simhash(tf)
    rows = {r["id"]: int(r["simhash"]) for r in fp.collect()}
    k = 3
    exp = {
        (a, b): bin(rows[a] ^ rows[b]).count("1")
        for a in rows for b in rows
        if a < b and bin(rows[a] ^ rows[b]).count("1") <= k
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(fp, max_hamming=k).collect()
    }
    assert got == exp
    assert len(got) > 0  # synth corpus plants exact clones -> hamming 0


def test_simhash_pairs_band_split_covers_all_bits(spark):
    # two fingerprints differing ONLY in the last (narrow) band must
    # still pair at hamming 1 — the band math must cover bit 59
    fp = spark.createDataFrame(
        [(1, 0), (2, 1 << 59)], "id long, simhash long"
    )
    out = dedup.simhash_pairs(fp, max_hamming=3).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 1)]
