"""Pinned canonical constants — the ONLY place these live (SURVEY.md §8).

The reference (babysuse/NYU_search-engine) is a three-branch course project
(crawler / C++ inverted-index builder / C++ BM25 query processor,
/root/reference/README.md:5-7) whose binaries are unreadable offline, so
these values are *this* engine's single-source-of-truth spec; every test
golden and every DuckDB oracle derives from them.
"""

from __future__ import annotations

# --- §8.1 Tokenizer ---------------------------------------------------------
# content.lower() then tokens = maximal runs of [a-z0-9]+ (ASCII; anything
# else is a delimiter). Keep tokens of length 1..64. No stemming/stopwords.
TOKEN_SPLIT_RE = r"[^a-z0-9]+"
TOKEN_MATCH_RE = r"[a-z0-9]+"
TOKEN_MIN_LEN = 1
TOKEN_MAX_LEN = 64

# --- §8.2 Varbyte / block layout -------------------------------------------
# Per uint64: little-endian 7-bit groups, least-significant group first;
# high bit = continuation (1 => more bytes follow). docIDs stored as
# ascending gaps (first value absolute); tf and doclen stored raw.
VB_CONT_BIT = 0x80
BLOCK_SIZE = 128  # postings per block-max block

# --- §8.3 BM25 ---------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
# idf = max(0, ln((N - df + 0.5) / (df + 0.5)))  (RSJ, no +1, floored at 0)
DEFAULT_TOP_K = 10
SCORE_ROUND_DECIMALS = 6  # oracle-comparison rounding only; engine paths keep float64

# --- §8.4 docID --------------------------------------------------------------
# Dense 0..N-1 by ascending (repo, path, commit) byte order.
DOC_SORT_KEYS = ("repo", "path", "commit")

# --- §8.5 Physical layout ----------------------------------------------------
# Document-sharded index (web-scale standard): shard = doc_id // SHARD_SIZE.
# Within a shard the postings table has exactly one row per term, docIDs
# ascending — so a hot term's row is bounded by SHARD_SIZE postings no matter
# how large the corpus gets (this IS the mandated skew split: the salt key is
# the deterministic doc-range shard, and the "post-merge" is the lexicon's
# groupBy(term) over per-shard stats + the query-time per-shard fan-out).
# Files are written sorted by (shard, term) so Parquet min/max row-group
# stats prune both the shard and the term dimension.
DEFAULT_SHARD_SIZE = 50_000       # docs per shard; sized so a hot term's
                                  # uncompressed slice stays ~O(MB)
DEFAULT_SHUFFLE_PARTITIONS = 32

# Index directory layout (under the index root path)
POSTINGS_DIR = "postings"
LEXICON_DIR = "lexicon"
DOCS_DIR = "docs"
STATS_DIR = "stats"
MANIFEST_DIR = "manifest"
