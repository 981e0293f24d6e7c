"""Probe the 2048-query batch bandwidth wall (VERDICT r3 next #6).

BENCH/QUERY_SCALING found the widest batch tier scaling at only ~0.47:
once a batch's term set covers most of the vocabulary, every shard
kernel decodes most of the index in one working set and the single box's
memory bandwidth saturates. This measures whether bounding the distinct
terms per scan chunk (search_batch(max_terms_per_chunk=...) — queries
greedily grouped by term overlap, one scan per chunk) recovers
throughput at local[8] by keeping each kernel's decoded set
cache-resident, at the cost of more per-chunk job floors.

Writes BENCH/BATCH_CHUNKING_500k.md.
Usage: python scripts/batch_chunking_probe.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from and_pruning_ab import ensure_index, index_root  # noqa: E402
from hostwindow import cpu_mix, cpu_sample, wait_for_clean_window  # noqa: E402
from query_scaling_bench import big_query_set  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CORES = 8
BATCH_N = 2048
ARMS = (None, 1024, 512, 256, 128)  # max_terms_per_chunk; None = one scan


def main() -> None:
    import and_pruning_ab
    and_pruning_ab.N_DOCS = N_DOCS

    from nyu_search_engine_spark.plans.search_index import IndexSearcher
    from nyu_search_engine_spark.session import get_spark

    ensure_index()
    wait_for_clean_window()
    spark = get_spark(app_name="batch_chunk", cores=CORES)
    searcher = IndexSearcher(spark, index_root())
    big = dict(enumerate(big_query_set(BATCH_N)))

    # warm: scan footers, python workers, lexicon
    searcher.search_batch(dict(list(big.items())[:8])).count()

    walls: dict[str, list[float]] = {str(a): [] for a in ARMS}
    n_chunks: dict[str, int] = {}
    rows_by_arm: dict[str, int] = {}
    c0 = cpu_sample()
    for _ in range(REPS):
        for arm in ARMS:
            t = time.time()
            n = searcher.search_batch(big, max_terms_per_chunk=arm).count()
            walls[str(arm)].append(round(time.time() - t, 3))
            rows_by_arm[str(arm)] = n
    mix = cpu_mix(c0, cpu_sample())
    # chunk counts for context (cheap planning-only recompute)
    all_terms = sorted({t for q in big.values() for t in q.terms})
    df_by_term = searcher._probe_df(all_terms)
    from nyu_search_engine_spark.functions.bm25 import idf_np
    qplans = {}
    for qid, q in big.items():
        kept = [t for t in dict.fromkeys(q.terms) if t in df_by_term]
        if not kept or (q.mode == "AND" and len(kept) < len(set(q.terms))):
            continue
        meta = sorted((df_by_term[t], t) for t in kept)
        qplans[qid] = (q.mode, q.k,
                       [(t, idf_np(d, searcher.n_docs)) for d, t in meta])
    for arm in ARMS:
        n_chunks[str(arm)] = len(IndexSearcher._chunk_qplans(qplans, arm))
    spark.stop()

    base_qps = BATCH_N / min(walls["None"])
    rows, results = "", {}
    for arm in ARMS:
        w = min(walls[str(arm)])
        qps = BATCH_N / w
        results[str(arm)] = {"min_wall_s": w, "qps": round(qps, 1),
                             "n_chunks": n_chunks[str(arm)],
                             "all_walls_s": walls[str(arm)],
                             "rows": rows_by_arm[str(arm)]}
        rows += (f"| {arm or 'no chunking'} | {n_chunks[str(arm)]} | {w} | "
                 f"{qps:,.1f} | {qps / base_qps:.3f}x |\n")
    # sanity: identical result cardinality across arms
    assert len(set(rows_by_arm.values())) == 1, rows_by_arm

    md = f"""# BENCH/BATCH_CHUNKING — bounding per-scan distinct terms at 2048 queries

Same warm {N_DOCS:,}-doc index, local[{CORES}], {BATCH_N}-query mixed
workload (seed 7), {REPS} reps per arm interleaved, min published.
Result rows identical across arms ({next(iter(rows_by_arm.values()))}).
Phase sys+steal: {mix.get('sys', 0) + mix.get('steal', 0):.1f}%.

| max_terms_per_chunk | chunks | min wall s | queries/s | vs no chunking |
| --- | --- | --- | --- | --- |
{rows}
Raw JSON:

```json
{json.dumps({'n_docs': N_DOCS, 'batch_n': BATCH_N, 'reps': REPS,
             'results': results, 'cpu_mix': mix}, indent=2)}
```
"""
    tag = f"{N_DOCS // 1000}k" if N_DOCS < 1_000_000 else f"{N_DOCS // 1_000_000}M"
    out_md = f"/root/repo/BENCH/BATCH_CHUNKING_{tag}.md"
    with open(out_md, "w") as fh:
        fh.write(md)
    print(f"wrote {out_md}")
    for arm, r in results.items():
        print(f"  chunk={arm}: {r['min_wall_s']}s, {r['qps']} q/s, "
              f"{r['n_chunks']} chunks")


if __name__ == "__main__":
    main()
