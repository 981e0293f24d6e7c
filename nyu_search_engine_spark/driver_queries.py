"""Driver-contract query catalog (__spark_entry__ backend).

One entry per implemented operator family (SURVEY.md §2 + the training-
pipeline extensions). Each Spark callable takes (spark, sf_dir) and has a
DuckDB oracle twin in ORACLES (same column names, same rounding) unless
the operator is approximate/stubbed by design (rows-only checks).

The driver documents table is adapted to the corpus shape by a pure
projection (FIXTURES.md §4): repo=source, path=str(doc_id), commit='v0',
content=text — so the engine's pinned tie-break (repo, path, commit)
equals the oracle's ORDER BY (source, CAST(doc_id AS VARCHAR)).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .constants import BM25_B, BM25_K1
from .functions.tokenize import tokens_col
from .operators import dedup, multimodal, similarity, textstats
from .plans.search import Query, bruteforce_topk
from .sources.corpus import load_documents_corpus

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB twins of the §8.1 tokenizer / §8.3 BM25)
# ---------------------------------------------------------------------------

TOKS = """
  toks AS (
    SELECT doc_id, t.term AS term
    FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
    WHERE t.term <> '' AND length(t.term) BETWEEN 1 AND 64
  )
"""

POS_TOKS = """
  pos_toks AS (
    SELECT doc_id, t.term AS term,
           row_number() OVER (PARTITION BY doc_id) AS pos
    FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
    WHERE t.term <> '' AND length(t.term) BETWEEN 1 AND 64
  )
"""

TRI_SHINGLES = POS_TOKS + """,
  sh AS (
    SELECT DISTINCT doc_id AS id, shingle FROM (
      SELECT doc_id,
             term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
      FROM pos_toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ) WHERE shingle IS NOT NULL
  )
"""


def _bm25_oracle(terms: list[str], mode: str, k: int) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(*) = {len(terms)}" if mode == "AND" else ""
    return f"""
WITH {TOKS},
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ({tlist}) GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
    greatest(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5)), 0.0)
      * (tf.tf * {BM25_K1 + 1.0}) /
        (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.doclen / stats.avgdl)) AS partial
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
agg AS (SELECT doc_id, sum(partial) AS score FROM scored GROUP BY doc_id {having}),
named AS (SELECT a.doc_id, a.score, d.source FROM agg a JOIN documents d USING (doc_id))
SELECT row_number() OVER (ORDER BY score DESC, source, CAST(doc_id AS VARCHAR)) AS rank,
       doc_id, round(score, 6) AS score
FROM named ORDER BY score DESC, source, CAST(doc_id AS VARCHAR) LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Spark-side helpers
# ---------------------------------------------------------------------------

def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _bm25_result(corpus_topk: DataFrame) -> DataFrame:
    """(rank, doc_id, score) from a corpus-shaped top-k (path = doc_id)."""
    return corpus_topk.select(
        "rank",
        F.col("path").cast("long").alias("doc_id"),
        F.round("score", 6).alias("score"),
    )


_CORPORA: dict[tuple[str, str], DataFrame] = {}
_TEMPDIRS: list[str] = []


def _register_tempdir(path: str) -> str:
    _TEMPDIRS.append(path)
    return path


@atexit.register
def _cleanup_tempdirs() -> None:
    for p in _TEMPDIRS:
        shutil.rmtree(p, ignore_errors=True)


def _skey(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Session-scoped cache key: cached DataFrames/searchers are bound to
    one SparkSession, so a restarted driver session must not hit entries
    from the dead one (they error on use)."""
    return (spark.sparkContext.applicationId, sf_dir)


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized adapted corpus per (session, sf_dir): one DataFrame object,
    so the per-corpus BM25 stats cache (plans/search._corpus_stats) hits
    across queries instead of re-tokenizing for N/avgdl every call."""
    key = _skey(spark, sf_dir)
    if key not in _CORPORA:
        _CORPORA[key] = load_documents_corpus(spark, sf_dir)
    return _CORPORA[key]


def _bruteforce(spark, sf_dir, terms, mode, k=10) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return _bm25_result(bruteforce_topk(corpus, Query(tuple(terms), mode, k)))


_SEARCHERS: dict[tuple[str, str], "object"] = {}
_ANN_INDEXES: dict[str, str] = {}
_IVF_INDEXES: dict[str, str] = {}


def _searcher(spark: SparkSession, sf_dir: str):
    """Build (once per session+sf_dir) and cache an index over the docs."""
    from .plans.build_index import build_index
    from .plans.search_index import IndexSearcher

    key = _skey(spark, sf_dir)
    if key not in _SEARCHERS:
        root = _register_tempdir(tempfile.mkdtemp(prefix="nyu_drv_idx_"))
        corpus = load_documents_corpus(spark, sf_dir)
        build_index(spark, corpus, root, shard_size=200, n_groups=2)
        _SEARCHERS[key] = IndexSearcher(spark, root)
    return _SEARCHERS[key]


def _indexed(spark, sf_dir, terms, mode, k, method) -> DataFrame:
    s = _searcher(spark, sf_dir)
    res = s.search(Query(tuple(terms), mode, k), method=method)
    return res.select(
        "rank", F.col("path").cast("long").alias("doc_id"),
        F.round("score", 6).alias("score"),
    )


def _tokens_exploded(spark, sf_dir) -> DataFrame:
    return _documents(spark, sf_dir).select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )


def _tri_shingles(spark, sf_dir) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    )
    return dedup.shingles(toks, "doc_id", "tokens", 3)


# ---------------------------------------------------------------------------
# the catalog
# ---------------------------------------------------------------------------

def build_queries() -> dict:
    q: dict = {}

    # --- index-side statistics (SURVEY.md §2.4 A1-A3) ------------------------
    q["term_df_cf"] = lambda spark, sf: (
        _tokens_exploded(spark, sf)
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("cf"),
        )
    )
    q["doclen_per_doc"] = lambda spark, sf: (
        _documents(spark, sf).select(
            "doc_id", F.size(tokens_col(F.col("text"))).alias("doclen")
        )
    )
    q["corpus_stats"] = lambda spark, sf: (
        _documents(spark, sf)
        .select(F.size(tokens_col(F.col("text"))).alias("dl"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("dl"), 6).alias("avgdl"),
            F.sum("dl").alias("total_tokens"),
        )
    )
    q["doc_sha256"] = lambda spark, sf: (
        _documents(spark, sf).select("doc_id", F.sha2("text", 256).alias("sha256"))
    )

    # --- BM25 query paths (SURVEY.md §2.3 J1/J2, §2.6 T3) --------------------
    q["bm25_or_topk"] = lambda spark, sf: _bruteforce(spark, sf, ["dup", "spark", "merge"], "OR")
    q["bm25_and_topk"] = lambda spark, sf: _bruteforce(spark, sf, ["dup", "key"], "AND")
    q["bm25_and_oov_empty"] = lambda spark, sf: _bruteforce(spark, sf, ["dup", "zzznotaterm"], "AND")
    q["bm25_tiebreak_topk"] = lambda spark, sf: _bruteforce(spark, sf, ["batch", "scan"], "OR", 15)
    q["search_pruned_or"] = lambda spark, sf: _indexed(spark, sf, ["dup", "spark", "merge"], "OR", 10, "pruned")
    q["search_pruned_and"] = lambda spark, sf: _indexed(spark, sf, ["dup", "key"], "AND", 10, "pruned")
    q["search_exhaustive_or"] = lambda spark, sf: _indexed(spark, sf, ["dup", "spark", "merge"], "OR", 10, "exhaustive")

    # batched multi-query API (SURVEY §2.5/T3 batch form): 4 queries
    # (OR/AND mix + an OOV-AND that must contribute zero rows) answered in
    # ONE postings scan, rank-identical to the per-query pruned path
    def _batch(spark, sf):
        s = _searcher(spark, sf)
        res = s.search_batch(
            {
                1: Query(("dup", "spark", "merge"), "OR", 5),
                2: Query(("dup", "key"), "AND", 5),
                3: Query(("batch", "scan"), "OR", 7),
                4: Query(("dup", "zzznotaterm"), "AND", 5),
            },
            decorate=True,
        )
        return res.select(
            "query_id", "rank", F.col("path").cast("long").alias("doc_id"),
            F.round("score", 6).alias("score"),
        )

    q["bm25_batch_topk"] = _batch

    # --- dedup family ---------------------------------------------------------
    q["dedup_exact"] = lambda spark, sf: dedup.exact_dup_groups(
        _documents(spark, sf), "doc_id", "text"
    ).select(F.col("id").alias("doc_id"), "content_sha256", "canonical_id", "group_size")
    q["dedup_minhash_sig"] = lambda spark, sf: (
        dedup.minhash_signatures(_tri_shingles(spark, sf), 16)
        .select(F.col("id").alias("doc_id"), F.concat_ws(",", "sig").alias("sig_str"))
    )
    q["dedup_lsh_pairs"] = lambda spark, sf: (
        dedup.lsh_candidate_pairs(
            dedup.minhash_signatures(_tri_shingles(spark, sf), 16), 4, 4
        )
    )
    q["dedup_ngram_jaccard"] = lambda spark, sf: (
        dedup.ngram_jaccard_pairs(_tri_shingles(spark, sf), 0.5)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    q["dedup_simhash"] = lambda spark, sf: (
        dedup.simhash(
            _tokens_exploded(spark, sf).groupBy(
                F.col("doc_id").alias("id"), "term"
            ).agg(F.count("*").alias("tf"))
        ).select(F.col("id").alias("doc_id"), "simhash")
    )
    q["dedup_clusters"] = lambda spark, sf: (
        # pairs -> connected components -> per-doc cluster label + size:
        # the deletion-set builder (keep cluster_id, drop the rest)
        dedup.neardup_clusters(
            dedup.lsh_candidate_pairs(
                dedup.minhash_signatures(_tri_shingles(spark, sf), 16), 4, 4
            ),
            _documents(spark, sf), "doc_id",
        ).select(F.col("id").alias("doc_id"), "cluster_id", "cluster_size")
    )
    q["dedup_simhash_pairs"] = lambda spark, sf: (
        # Manku-style pigeonhole band blocking over the 60-bit simhash:
        # complete for hamming <= 3 by construction, bucket-local join
        dedup.simhash_pairs(
            dedup.simhash(
                _tokens_exploded(spark, sf).groupBy(
                    F.col("doc_id").alias("id"), "term"
                ).agg(F.count("*").alias("tf"))
            ),
            max_hamming=3,
        )
    )
    q["dedup_embedding_pairs"] = lambda spark, sf: (
        dedup.embedding_neardup_pairs(_embeddings(spark, sf), "vec_id", "embedding", 0.40)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
    q["dedup_embedding_lsh_pairs"] = lambda spark, sf: (
        # corpus-scale blocked variant: bucket-local join, exact cosines
        dedup.embedding_neardup_lsh_pairs(
            _embeddings(spark, sf), "vec_id", "embedding", 0.40,
            n_planes=4, seed=42,
        ).select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )

    # --- similarity search -----------------------------------------------------
    def _qvec(spark, sf, vid=0):
        return list(
            _embeddings(spark, sf).filter(F.col("vec_id") == vid).first()["embedding"]
        )

    q["ann_topk"] = lambda spark, sf: (
        similarity.cosine_topk(
            _embeddings(spark, sf), "vec_id", "embedding", _qvec(spark, sf), 10,
            exclude_id=0,
        ).select("rank", F.col("id").alias("vec_id"), F.round("cosine", 6).alias("cosine"))
    )
    q["ann_batch_topk"] = lambda spark, sf: (
        similarity.cosine_topk_batch(
            _embeddings(spark, sf), "vec_id", "embedding",
            _embeddings(spark, sf).filter(F.col("vec_id").isin([1, 2, 3])),
            "vec_id", "embedding", 3,
        ).select("query_id", "rank", F.col("id").alias("vec_id"),
                 F.round("cosine", 6).alias("cosine"))
    )
    def _ann_lsh(spark, sf):
        # scale path: probe the PERSISTED bucket index (built once per sf;
        # bucket IN (...) prunes to the probed partitions) — results are
        # identical to the on-the-fly lsh_topk, and exact vs the baked-
        # hyperplane DuckDB oracle
        if sf not in _ANN_INDEXES:
            root = _register_tempdir(tempfile.mkdtemp(prefix="nyu_drv_ann_"))
            similarity.build_ann_index(
                _embeddings(spark, sf), "vec_id", "embedding", root,
                n_planes=4, seed=42,
            )
            _ANN_INDEXES[sf] = root
        return similarity.lsh_topk_indexed(
            spark, _ANN_INDEXES[sf], _qvec(spark, sf), 10, exclude_id=0,
        ).select("rank", F.col("id").alias("vec_id"),
                 F.round("cosine", 6).alias("cosine"))

    q["ann_lsh_topk"] = _ann_lsh

    def _ann_ivf(spark, sf):
        # IVF scale path: deterministic sample-trained centroids, rows
        # partitioned by nearest-centroid cluster, probes scan only the
        # nprobe nearest clusters (partition pruning)
        if sf not in _IVF_INDEXES:
            root = _register_tempdir(tempfile.mkdtemp(prefix="nyu_drv_ivf_"))
            similarity.build_ivf_index(
                _embeddings(spark, sf), "vec_id", "embedding", root,
                k=8, iters=5, train_ids_below=256,
            )
            _IVF_INDEXES[sf] = root
        return similarity.ivf_topk(
            spark, _IVF_INDEXES[sf], _qvec(spark, sf), 10, nprobe=2,
            exclude_id=0,
        ).select("rank", F.col("id").alias("vec_id"),
                 F.round("cosine", 6).alias("cosine"))

    q["ann_ivf_topk"] = _ann_ivf

    # --- text analysis -----------------------------------------------------------
    q["text_token_stats"] = lambda spark, sf: (
        textstats.token_stats(_documents(spark, sf), "doc_id", "text")
        .select(F.col("id").alias("doc_id"), "n_tokens", "n_ws_tokens",
                F.round("avg_token_len", 6).alias("avg_token_len"))
    )
    q["text_quality"] = lambda spark, sf: (
        textstats.quality_scores(_documents(spark, sf), "doc_id", "text")
        .select(F.col("id").alias("doc_id"), "n_chars",
                F.round("alpha_ratio", 6).alias("alpha_ratio"),
                F.round("digit_ratio", 6).alias("digit_ratio"),
                F.round("punct_ratio", 6).alias("punct_ratio"),
                F.round("stopword_ratio", 6).alias("stopword_ratio"),
                F.round("uniq_token_ratio", 6).alias("uniq_token_ratio"))
    )
    q["text_langid"] = lambda spark, sf: (
        textstats.lang_id(_documents(spark, sf), "doc_id", "text")
        .select(F.col("id").alias("doc_id"), "lang_pred", "lang_score")
    )
    q["text_fingerprint"] = lambda spark, sf: (
        textstats.fingerprints(_documents(spark, sf), "doc_id", "text", 64, 5)
        .select(F.col("id").alias("doc_id"), "fp_head", "fp_min_shingle")
    )

    # --- multimodal plumbing -------------------------------------------------------
    q["multimodal_binary_meta"] = lambda spark, sf: (
        multimodal.binary_meta(
            _documents(spark, sf).select("doc_id", F.encode("text", "UTF-8").alias("payload")),
            "doc_id", "payload",
        ).select(F.col("id").alias("doc_id"), "n_bytes", "header_hex", "payload_sha256")
    )
    q["multimodal_image_features"] = lambda spark, sf: (
        # deterministic fake decode (stride-mean byte math) — exact oracle
        multimodal.image_features(
            _documents(spark, sf).select("doc_id", F.encode("text", "UTF-8").alias("payload")),
            "doc_id", "payload", deterministic_fake=True,
        ).select(
            F.col("media_id").alias("doc_id"),
            "n_bytes",
            *[
                F.round(F.element_at("feat", j + 1), 6).alias(f"f{j}")
                for j in range(8)
            ],
        )
    )
    q["multimodal_frame_sample"] = lambda spark, sf: (
        # deterministic fake demux (256-byte slices + sha256) — exact oracle
        multimodal.frame_sample(
            _documents(spark, sf).select("doc_id", F.encode("text", "UTF-8").alias("payload")),
            "doc_id", "payload", every_n_bytes=256, deterministic_fake=True,
        ).select(F.col("media_id").alias("doc_id"), "frame_idx", "frame_sha256")
    )
    return q


MINHASH_SQL = TRI_SHINGLES + """,
perm AS (SELECT i::INT AS perm FROM generate_series(0, 15) g(i)),
mh AS (
  SELECT sh.id, perm.perm, min(md5(perm.perm || '|' || sh.shingle)) AS mh
  FROM sh CROSS JOIN perm GROUP BY sh.id, perm.perm
),
sigs AS (
  SELECT id, list(mh ORDER BY perm) AS sig,
         string_agg(mh, ',' ORDER BY perm) AS sig_str
  FROM mh GROUP BY id
)
"""


def build_oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    # Seeded hyperplane literals shared by the LSH oracles (64-dim driver
    # embeddings; Hamming-distance<=1 == xor IN (0,1,2,4,8) for 4 planes).
    from .operators.similarity import hyperplanes

    planes = hyperplanes(64, 4, seed=42)
    plane_rows = ",\n    ".join(
        f"({j}, [{', '.join(repr(float(x)) for x in planes[j])}])"
        for j in range(4)
    )
    o["term_df_cf"] = f"""
WITH {TOKS}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf FROM toks GROUP BY term
"""
    o["doclen_per_doc"] = f"""
WITH {TOKS}
SELECT d.doc_id, coalesce(t.n, 0) AS doclen
FROM documents d LEFT JOIN (SELECT doc_id, count(*) n FROM toks GROUP BY doc_id) t
USING (doc_id)
"""
    o["corpus_stats"] = f"""
WITH {TOKS},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS n FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) n FROM toks GROUP BY doc_id) t USING (doc_id))
SELECT count(*) AS n_docs, round(avg(n), 6) AS avgdl, sum(n)::BIGINT AS total_tokens FROM dl
"""
    o["doc_sha256"] = "SELECT doc_id, sha256(text) AS sha256 FROM documents"

    o["bm25_or_topk"] = _bm25_oracle(["dup", "spark", "merge"], "OR", 10)
    o["bm25_and_topk"] = _bm25_oracle(["dup", "key"], "AND", 10)
    o["bm25_and_oov_empty"] = _bm25_oracle(["dup", "zzznotaterm"], "AND", 10)
    o["bm25_tiebreak_topk"] = _bm25_oracle(["batch", "scan"], "OR", 15)
    o["search_pruned_or"] = o["bm25_or_topk"]
    o["search_pruned_and"] = o["bm25_and_topk"]
    o["search_exhaustive_or"] = o["bm25_or_topk"]
    o["bm25_batch_topk"] = "\nUNION ALL\n".join(
        f"SELECT {qid} AS query_id, * FROM ({_bm25_oracle(terms, mode, k)})"
        for qid, terms, mode, k in [
            (1, ["dup", "spark", "merge"], "OR", 5),
            (2, ["dup", "key"], "AND", 5),
            (3, ["batch", "scan"], "OR", 7),
            (4, ["dup", "zzznotaterm"], "AND", 5),
        ]
    )

    o["dedup_exact"] = """
WITH h AS (SELECT doc_id, sha256(text) AS content_sha256 FROM documents),
g AS (SELECT content_sha256, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM h GROUP BY content_sha256)
SELECT h.doc_id, h.content_sha256, g.canonical_id, g.group_size
FROM h JOIN g USING (content_sha256)
"""
    o["dedup_minhash_sig"] = f"WITH {MINHASH_SQL} SELECT id AS doc_id, sig_str FROM sigs"
    o["dedup_lsh_pairs"] = f"""
WITH {MINHASH_SQL},
bands AS (
  SELECT id, b.b AS band,
         md5(array_to_string(sig[b.b * 4 + 1 : b.b * 4 + 4], ',')) AS bkey
  FROM sigs, (SELECT i::INT AS b FROM generate_series(0, 3) g(i)) b
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM bands a JOIN bands b USING (band, bkey) WHERE a.id < b.id
"""
    # clusters = transitive closure of the LSH candidate pairs; DuckDB's
    # recursive CTE plays the oracle for the large-star/small-star CC
    o["dedup_clusters"] = f"""
WITH RECURSIVE {MINHASH_SQL},
bands AS (
  SELECT id, b.b AS band,
         md5(array_to_string(sig[b.b * 4 + 1 : b.b * 4 + 4], ',')) AS bkey
  FROM sigs, (SELECT i::INT AS b FROM generate_series(0, 3) g(i)) b
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b USING (band, bkey) WHERE a.id < b.id
),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u),
lab AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)
SELECT lab.doc_id, lab.cluster_id, sz.cluster_size FROM lab JOIN sz USING (cluster_id)
"""
    o["dedup_ngram_jaccard"] = f"""
WITH {TRI_SHINGLES},
sizes AS (SELECT id, count(*) n FROM sh GROUP BY id),
inter AS (SELECT a.id ia, b.id ib, count(*) c FROM sh a JOIN sh b USING (shingle)
          WHERE a.id < b.id GROUP BY 1, 2),
j AS (SELECT ia AS id_a, ib AS id_b, c * 1.0 / (sa.n + sb.n - c) AS jac
      FROM inter JOIN sizes sa ON sa.id = ia JOIN sizes sb ON sb.id = ib)
SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j WHERE jac >= 0.5
"""
    o["dedup_simhash"] = f"""
WITH {TOKS},
tf AS (SELECT doc_id AS id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
h AS (SELECT id, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tf),
w AS (
  SELECT id, j.j AS j, sum(tf * (((h >> j.j) & 1) * 2 - 1)) AS w
  FROM h, (SELECT i::INT AS j FROM generate_series(0, 59) g(i)) j
  GROUP BY id, j.j
)
SELECT id AS doc_id,
       sum(CASE WHEN w > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
FROM w GROUP BY id
"""
    o["dedup_simhash_pairs"] = f"""
WITH {TOKS},
tf AS (SELECT doc_id AS id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
h AS (SELECT id, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tf),
w AS (
  SELECT id, j.j AS j, sum(tf * (((h >> j.j) & 1) * 2 - 1)) AS w
  FROM h, (SELECT i::INT AS j FROM generate_series(0, 59) g(i)) j
  GROUP BY id, j.j
),
fp AS (
  SELECT id,
         sum(CASE WHEN w > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
  FROM w GROUP BY id
),
bands AS (
  SELECT id, simhash, j.j AS band, (simhash >> (j.j * 15)) & 32767 AS bkey
  FROM fp, (SELECT i::INT AS j FROM generate_series(0, 3) g(i)) j
),
cand AS (
  SELECT DISTINCT a.id AS ia, b.id AS ib, a.simhash AS ha, b.simhash AS hb
  FROM bands a JOIN bands b USING (band, bkey) WHERE a.id < b.id
)
SELECT ia AS id_a, ib AS id_b, bit_count(xor(ha, hb))::INT AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
"""
    o["dedup_embedding_pairs"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm, v FROM e),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cosine, 6) AS cosine FROM p WHERE cosine >= 0.40
"""
    o["dedup_embedding_lsh_pairs"] = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
pl(j, p) AS (VALUES
    {plane_rows}
),
b AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_dot_product(e.v, pl.p) > 0
                  THEN (1::BIGINT << pl.j) ELSE 0 END)::BIGINT AS bucket
  FROM e CROSS JOIN pl GROUP BY e.vec_id
),
n AS (SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, b.bucket
      FROM e JOIN b USING (vec_id)),
p AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         list_dot_product(a.v, c.v) / (a.nrm * c.nrm) AS cosine
  FROM n a JOIN n c ON a.vec_id < c.vec_id
  WHERE xor(a.bucket, c.bucket) IN (0, 1, 2, 4, 8)
)
SELECT id_a, id_b, round(cosine, 6) AS cosine FROM p WHERE cosine >= 0.40
"""
    o["ann_topk"] = """
WITH q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv FROM embeddings WHERE vec_id = 0),
e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings WHERE vec_id <> 0),
s AS (
  SELECT e.vec_id,
         list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM e CROSS JOIN q
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank,
       vec_id, round(cosine, 6) AS cosine
FROM s ORDER BY cosine DESC, vec_id LIMIT 10
"""
    o["ann_batch_topk"] = """
WITH q AS (SELECT vec_id AS query_id, list_transform(embedding, x -> x::DOUBLE) AS qv
           FROM embeddings WHERE vec_id IN (1, 2, 3)),
e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
s AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                            e.vec_id) AS rank
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id, round(cosine, 6) AS cosine FROM s WHERE rank <= 3
"""
    o["text_token_stats"] = f"""
WITH {TOKS},
t AS (SELECT doc_id, count(*) AS n_tokens, avg(length(term)) AS atl FROM toks GROUP BY doc_id),
ws AS (
  SELECT doc_id, count(*) AS n_ws FROM (
    SELECT doc_id, w.tok FROM documents,
      unnest(regexp_split_to_array(text, '\\s+')) AS w(tok) WHERE w.tok <> ''
  ) GROUP BY doc_id
)
SELECT d.doc_id, coalesce(t.n_tokens, 0) AS n_tokens, coalesce(ws.n_ws, 0) AS n_ws_tokens,
       round(coalesce(t.atl, 0.0), 6) AS avg_token_len
FROM documents d LEFT JOIN t USING (doc_id) LEFT JOIN ws USING (doc_id)
"""
    stop_list = ", ".join(f"'{s}'" for s in textstats.STOPWORDS)
    o["text_quality"] = f"""
WITH {TOKS},
tk AS (
  SELECT doc_id, count(*) AS n_toks,
         sum(CASE WHEN term IN ({stop_list}) THEN 1 ELSE 0 END) AS stops,
         count(DISTINCT term) AS uniq
  FROM toks GROUP BY doc_id
),
base AS (
  SELECT doc_id, lower(text) AS c, length(text)::DOUBLE AS n FROM documents
)
SELECT b.doc_id, b.n::BIGINT AS n_chars,
  round(CASE WHEN b.n > 0 THEN length(regexp_replace(b.c, '[^a-z]', '', 'g')) / b.n ELSE 0.0 END, 6) AS alpha_ratio,
  round(CASE WHEN b.n > 0 THEN length(regexp_replace(b.c, '[^0-9]', '', 'g')) / b.n ELSE 0.0 END, 6) AS digit_ratio,
  round(CASE WHEN b.n > 0 THEN length(regexp_replace(b.c, '[a-z0-9\\s]', '', 'g')) / b.n ELSE 0.0 END, 6) AS punct_ratio,
  round(CASE WHEN coalesce(tk.n_toks, 0) > 0 THEN tk.stops * 1.0 / tk.n_toks ELSE 0.0 END, 6) AS stopword_ratio,
  round(CASE WHEN coalesce(tk.n_toks, 0) > 0 THEN tk.uniq * 1.0 / tk.n_toks ELSE 0.0 END, 6) AS uniq_token_ratio
FROM base b LEFT JOIN tk USING (doc_id)
"""
    lang_cases = []
    for lang, markers in sorted(textstats.LANG_MARKERS.items()):
        mlist = ", ".join(f"'{m}'" for m in markers)
        lang_cases.append(
            f"sum(CASE WHEN term IN ({mlist}) THEN 1 ELSE 0 END) AS s_{lang}"
        )
    langs = sorted(textstats.LANG_MARKERS)
    best_expr = "GREATEST(" + ", ".join(f"s_{g}" for g in langs) + ")"
    pick = "CASE " + " ".join(
        f"WHEN s_{g} = {best_expr} THEN '{g}'" for g in langs
    ) + " END"
    o["text_langid"] = f"""
WITH {TOKS},
s AS (SELECT doc_id, {', '.join(lang_cases)} FROM toks GROUP BY doc_id),
full_s AS (
  SELECT d.doc_id, {', '.join(f'coalesce(s.s_{g}, 0) AS s_{g}' for g in langs)}
  FROM documents d LEFT JOIN s USING (doc_id)
)
SELECT doc_id,
       CASE WHEN {best_expr} > 0 THEN {pick} ELSE 'und' END AS lang_pred,
       {best_expr}::BIGINT AS lang_score
FROM full_s
"""
    o["text_fingerprint"] = f"""
WITH {POS_TOKS},
head AS (
  SELECT doc_id, md5(string_agg(term, ' ' ORDER BY pos)) AS fp_head
  FROM pos_toks WHERE pos <= 64 GROUP BY doc_id
),
five AS (
  SELECT doc_id, md5(term || ' ' || lead(term,1) OVER w || ' ' || lead(term,2) OVER w
         || ' ' || lead(term,3) OVER w || ' ' || lead(term,4) OVER w) AS h
  FROM pos_toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
mins AS (SELECT doc_id, min(h) AS fp_min_shingle FROM five WHERE h IS NOT NULL GROUP BY doc_id)
SELECT h.doc_id, h.fp_head, m.fp_min_shingle
FROM head h JOIN mins m USING (doc_id)
"""
    o["multimodal_binary_meta"] = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       upper(hex(encode(substr(text, 1, 4)))) AS header_hex,
       sha256(text) AS payload_sha256
FROM documents
"""
    # Exact twin of the deterministic fake decode (operators/multimodal.py):
    # feat[j] = avg of payload bytes at positions p ≡ j (mod 8), p < 1024,
    # / 255 in float64 (byte sums are integer-exact, so avg matches numpy).
    feat_cols = ",\n  ".join(
        f"round(coalesce(max(CASE WHEN fi = {j} THEN feat END), 0.0), 6) AS f{j}"
        for j in range(8)
    )
    # DuckDB's substr/sha256 are VARCHAR-only; the driver corpus is pure
    # ASCII (verified: octet_length(encode(text)) == length(text) at every
    # sf), so char positions == byte positions and VARCHAR ops are exact.
    o["multimodal_image_features"] = f"""
WITH p AS (SELECT doc_id, text FROM documents),
b AS (
  SELECT doc_id, (i % 8)::INT AS fi, ascii(substr(text, i + 1, 1)) AS v
  FROM p, generate_series(0, 1023) g(i)
  WHERE i < length(text)
),
f AS (SELECT doc_id, fi, avg(v) / 255.0 AS feat FROM b GROUP BY doc_id, fi)
SELECT p.doc_id, length(p.text)::BIGINT AS n_bytes,
  {feat_cols}
FROM p LEFT JOIN f USING (doc_id)
GROUP BY p.doc_id, p.text
"""
    # Exact twin of the fake frame sampler: one frame per 256-byte slice
    # (>= 1 frame even for empty payloads), sha256 per slice. The frame
    # index list is generated PER DOC (unnest of a per-row series), so the
    # oracle has no fixed document-size cap — the engine path has none.
    o["multimodal_frame_sample"] = """
WITH n AS (SELECT doc_id, text,
                  greatest((length(text) + 255) // 256, 1) AS n_frames
           FROM documents)
SELECT doc_id, i::INT AS frame_idx,
       sha256(substr(text, i * 256 + 1, 256)) AS frame_sha256
FROM n, unnest(generate_series(0, n_frames - 1)) t(i)
"""
    # Exact twin of similarity.lsh_topk: the seeded hyperplanes are baked
    # in as literals; Hamming-distance<=1 multi-probe == xor in {0,1,2,4,8}.
    o["ann_lsh_topk"] = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
pl(j, p) AS (VALUES
    {plane_rows}
),
b AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_dot_product(e.v, pl.p) > 0
                  THEN (1::BIGINT << pl.j) ELSE 0 END)::BIGINT AS bucket
  FROM e CROSS JOIN pl GROUP BY e.vec_id
),
q AS (SELECT b.bucket AS qb, e.v AS qv FROM b JOIN e USING (vec_id) WHERE vec_id = 0),
s AS (
  SELECT e.vec_id,
         list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM e JOIN b USING (vec_id) CROSS JOIN q
  WHERE xor(b.bucket, q.qb) IN (0, 1, 2, 4, 8) AND e.vec_id <> 0
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank,
       vec_id, round(cosine, 6) AS cosine
FROM s ORDER BY cosine DESC, vec_id LIMIT 10
"""
    # Exact twin of similarity.ivf_topk at the driver's sf0.01: centroids
    # come from the SAME pure-numpy spherical k-means (kmeans_np) over the
    # same deterministic training subset (vec_id < 256), baked as
    # literals; the probe-cluster list is precomputed the same way
    # ivf_topk does it. If the testdata is unreadable here, the entry
    # simply falls back to the driver's rows-only check.
    ivf_sql = _build_ivf_oracle()
    if ivf_sql is not None:
        o["ann_ivf_topk"] = ivf_sql
    return o


def _build_ivf_oracle(k: int = 8, iters: int = 5, nprobe: int = 2):
    """IVF oracle with centroids trained on the SAME sf the queries run at.

    The driver compares at sf0.01 (the default); scripts/driver_check.py
    exports SPARK_GRAFT_ORACLE_SF so checking another sf dir trains the
    oracle's centroid literals on that sf's embeddings — vec_id<256 rows
    differ across sf dirs, so a fixed path would yield wrong expectations
    everywhere but sf0.01.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    try:
        import duckdb as _dd
        import numpy as _np

        from .operators.similarity import kmeans_np

        rows = _dd.sql(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
            "WHERE vec_id < 256 ORDER BY vec_id"
        ).fetchall()
        qrow = _dd.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
            "WHERE vec_id = 0"
        ).fetchall()
        X = _np.array([r[1] for r in rows], dtype=_np.float64)
        cents = kmeans_np(X, k, iters)
        q = _np.asarray(qrow[0][0], dtype=_np.float64)
        sims = cents @ (q / _np.linalg.norm(q))
        order = _np.lexsort((_np.arange(len(cents)), -sims))
        probe = ", ".join(str(int(c)) for c in order[:nprobe])
        cent_rows = ",\n    ".join(
            f"({c}, [{', '.join(repr(float(x)) for x in cents[c])}])"
            for c in range(k)
        )
        return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
c(cluster, cv) AS (VALUES
    {cent_rows}
),
asg AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv)
                      / sqrt(list_dot_product(e.v, e.v)) DESC, c.cluster
           ) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
s AS (
  SELECT e.vec_id,
         list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM e JOIN asg USING (vec_id) CROSS JOIN q
  WHERE asg.cluster IN ({probe}) AND e.vec_id <> 0
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank,
       vec_id, round(cosine, 6) AS cosine
FROM s ORDER BY cosine DESC, vec_id LIMIT 10
"""
    except Exception:
        return None
