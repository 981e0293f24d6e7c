"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the mandated input shape (BASELINE.json input_hint):
    (repo string, path string, commit string, lang string, content string)

Planted features (all deterministic in the doc index, independent of
partitioning / parallelism):
  * 5 hot terms  ``hotterm0..4``   present in >60% of docs (skew tests)
  * 20 rare terms ``rareterm00..19`` with df in {1,2,3} (rarest-first tests);
    rareterm00 & rareterm01 co-planted in the same two docs (AND tests)
  * 1 vocab term ``oovterm`` never emitted (OOV tests)
  * the last 3 docs share identical content (exact-dup + score-tie tests)

Generation is distributed: ``spark.range(n) -> mapInPandas`` with a per-doc
RNG seeded by the doc index, so any partitioning yields the same corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
# bump on ANY change to the generated corpus: bench scripts key their
# /tmp parquet-corpus caches on (n_docs, SYNTH_VERSION), so a stale cache
# can never silently feed old data to a measurement
SYNTH_VERSION = 1
VOCAB_SIZE = 5000
ZIPF_S = 1.1
MIN_LEN, MAX_LEN = 30, 800

HOT_TERMS = [f"hotterm{i}" for i in range(5)]
RARE_TERMS = [f"rareterm{i:02d}" for i in range(20)]
OOV_TERM = "oovterm"

_EXTS = ["py", "cpp", "java", "rs", "go"]
_LANGS = {"py": "python", "cpp": "cpp", "java": "java", "rs": "rust", "go": "go"}
_SEPS = [" ", " ", "(", ") ", "; ", " = ", ".", ", "]

_KEYWORDS = [
    "def", "return", "class", "import", "for", "while", "if", "else", "fn",
    "let", "mut", "pub", "struct", "impl", "match", "func", "var", "const",
    "static", "void", "int", "float", "double", "string", "bool", "map",
    "vector", "hashmap", "arraylist", "self", "this", "new", "delete",
    "try", "catch", "throw", "async", "await", "yield", "lambda", "print",
]


def vocab() -> list[str]:
    """Deterministic ~5k-term vocabulary of code-like identifiers."""
    v = list(_KEYWORDS)
    i = 0
    while len(v) < VOCAB_SIZE - len(HOT_TERMS) - len(RARE_TERMS) - 1:
        a = _KEYWORDS[i % len(_KEYWORDS)]
        b = _KEYWORDS[(i * 7 + 3) % len(_KEYWORDS)]
        v.append(f"{a}_{b}_{i}")
        i += 1
    v += HOT_TERMS + RARE_TERMS + [OOV_TERM]
    return v


def _zipf_cum(n_core: int) -> np.ndarray:
    p = 1.0 / np.arange(1, n_core + 1) ** ZIPF_S
    p /= p.sum()
    return np.cumsum(p)


def _rare_placements(n_docs: int) -> dict[int, list[str]]:
    """doc index -> rare terms planted there (df in {1,2,3})."""
    out: dict[int, list[str]] = {}

    def plant(term: str, idx: int) -> None:
        out.setdefault(idx % n_docs, []).append(term)

    # co-planted pair for tiny-intersection queries
    for idx in (7, 13):
        plant(RARE_TERMS[0], idx)
        plant(RARE_TERMS[1], idx)
    for j in range(2, len(RARE_TERMS)):
        df_j = 1 + (j % 3)
        used: set[int] = set()
        for t in range(df_j):
            idx = (j * 2654435761 + t * 97 + 29) % n_docs
            while idx in used:  # avoid collision shrinking df
                idx = (idx + 1) % n_docs
            used.add(idx)
            plant(RARE_TERMS[j], idx)
    return out


def _doc_tokens(i: int, n_docs: int, voc: np.ndarray, cum: np.ndarray,
                rare_at: dict[int, list[str]]) -> list[str]:
    # last 3 docs are identical clones of doc n_docs-3 (dup / tie fixture)
    gen_i = min(i, n_docs - 3) if n_docs >= 3 else i
    rng = np.random.default_rng(SEED * 1_000_003 + gen_i)
    length = int(rng.integers(MIN_LEN, MAX_LEN + 1))
    draws = np.searchsorted(cum, rng.random(length))
    toks = list(voc[draws])
    for h, term in enumerate(HOT_TERMS):
        if (gen_i * 2654435761 + h * 40503) % 100 < 62:
            toks += [term] * (1 + (gen_i + h) % 3)
    toks += rare_at.get(gen_i, [])
    return toks


def _render(i: int, toks: list[str]) -> str:
    parts: list[str] = []
    for pos, t in enumerate(toks):
        parts.append(t)
        parts.append(_SEPS[(i + pos) % len(_SEPS)])
    return "".join(parts)


def gen_batch(indices: np.ndarray, n_docs: int) -> pd.DataFrame:
    """Generate corpus rows for the given doc indices (pure, deterministic)."""
    voc = np.array(vocab())
    # core draws only from the non-planted prefix; planted terms added above
    cum = _zipf_cum(VOCAB_SIZE - len(HOT_TERMS) - len(RARE_TERMS) - 1)
    rare_at = _rare_placements(n_docs)
    rows = []
    for i in indices:
        i = int(i)
        ext = _EXTS[i % len(_EXTS)]
        # clones must be byte-identical: render with the clone source index
        gen_i = min(i, n_docs - 3) if n_docs >= 3 else i
        rows.append(
            {
                "repo": f"org{i % 17}/repo{i % 251}",
                "path": f"src/d{i % 13}/f_{i}.{ext}",
                "commit": hashlib.sha256(f"c{i}".encode()).hexdigest()[:12],
                "lang": _LANGS[ext],
                "content": _render(gen_i, _doc_tokens(i, n_docs, voc, cum, rare_at)),
            }
        )
    return pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )


def synth_corpus_pandas(n_docs: int) -> pd.DataFrame:
    """Driver-side generation — tests and DuckDB oracles."""
    return gen_batch(np.arange(n_docs), n_docs)


def synth_corpus(spark: SparkSession, n_docs: int,
                 partitions: int | None = None) -> DataFrame:
    """Distributed generation — bench scale. Partitioning-invariant."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield gen_batch(pdf["id"].to_numpy(), n_docs)

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema="repo string, path string, commit string, "
                                 "lang string, content string")
    )
