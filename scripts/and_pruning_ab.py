"""A/B: conjunctive block-max score pruning on/off (VERDICT r3 next #4).

The AND kernel's theta-bound pruning (operators/daat.py shard_topk_and)
landed in r3 with property tests but no artifact isolating its effect.
This measures the pruned-path latency of AND workloads (k=10 and k=100,
hot and common term mixes) with ``and_bounds`` on vs off on the same
warm 500k index, same JVM, arms interleaved per rep so host drift hits
both equally. Results are rank-identical by construction (pytest
test_and_bounds_off_rank_identical); only wall time differs.

Writes BENCH/AND_PRUNING_AB_500k.md.
Usage: python scripts/and_pruning_ab.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from hostwindow import cpu_mix, cpu_sample, wait_for_clean_window  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CORES = 8


def index_root() -> str:
    from nyu_search_engine_spark.synth import SYNTH_VERSION
    return f"/tmp/ab_idx_{N_DOCS}_v{SYNTH_VERSION}"


def ensure_index() -> None:
    root = index_root()
    if os.path.exists(os.path.join(root, "index_meta.json")):
        return
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from nyu_search_engine_spark.session import get_spark\n"
        "from nyu_search_engine_spark.synth import synth_corpus\n"
        "from nyu_search_engine_spark.plans.build_index import build_index\n"
        f"spark = get_spark(app_name='ab_build', cores={CORES})\n"
        f"corpus = synth_corpus(spark, {N_DOCS}).persist(); corpus.count()\n"
        f"m = build_index(spark, corpus, {root!r}, n_groups=1, resume=False)\n"
        "print('BUILT', m['n_postings'])\n"
        "spark.stop()\n"
    )
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=3600)
    if "BUILT" not in out.stdout:
        raise RuntimeError(f"index build failed:\n{out.stderr[-3000:]}")


def workloads():
    from nyu_search_engine_spark.plans.search import Query
    return {
        "and_hot_k10": Query(("hotterm0", "hotterm1", "hotterm2"), "AND", 10),
        "and_hot_k100": Query(("hotterm0", "hotterm1", "hotterm2"), "AND", 100),
        "and_common_k100": Query(("def", "return"), "AND", 100),
        "and_common3_k100": Query(("def", "return", "class"), "AND", 100),
        "and_mixed_k100": Query(("hotterm0", "def"), "AND", 100),
    }


def main() -> None:
    from nyu_search_engine_spark.plans.search_index import IndexSearcher
    from nyu_search_engine_spark.session import get_spark

    ensure_index()
    wait_for_clean_window()
    spark = get_spark(app_name="and_ab", cores=CORES)
    searcher = IndexSearcher(spark, index_root())
    qs = workloads()
    # warm both arms
    for q in qs.values():
        searcher.search(q, "pruned", decorate=False).collect()
        searcher.search(q, "pruned", decorate=False, and_bounds=False).collect()

    lat: dict[str, dict[str, list[float]]] = {
        name: {"on": [], "off": []} for name in qs
    }
    c0 = cpu_sample()
    for _ in range(REPS):
        for name, q in qs.items():
            for arm, flag in (("on", True), ("off", False)):
                t = time.time()
                searcher.search(q, "pruned", decorate=False,
                                and_bounds=flag).collect()
                lat[name][arm].append(round(time.time() - t, 3))
    mix = cpu_mix(c0, cpu_sample())
    spark.stop()

    rows, results = "", {}
    for name in qs:
        on, off = min(lat[name]["on"]), min(lat[name]["off"])
        speedup = off / on if on else float("nan")
        results[name] = {"on_min_s": on, "off_min_s": off,
                         "speedup": round(speedup, 3),
                         "on_all": lat[name]["on"], "off_all": lat[name]["off"]}
        rows += f"| {name} | {on} | {off} | {speedup:.3f}x |\n"

    md = f"""# BENCH/AND_PRUNING_AB — conjunctive block-max pruning on/off

Same warm {N_DOCS:,}-doc index, same JVM (local[{CORES}]), arms
interleaved per rep ({REPS} reps, min published, all recorded), results
rank-identical both arms (tests/test_batch_search.py). Phase sys+steal:
{mix.get('sys', 0) + mix.get('steal', 0):.1f}%.

The bound fires only once a shard's heap holds k candidates, so k and
term selectivity decide whether pruning pays: the chunked leapfrog
already drops non-intersecting candidates cheaply, and the theta bound
prunes the *scoring* of intersecting ones.

| workload | pruning ON min s | pruning OFF min s | speedup (off/on) |
| --- | --- | --- | --- |
{rows}
Raw JSON:

```json
{json.dumps({'n_docs': N_DOCS, 'reps': REPS, 'results': results,
             'cpu_mix': mix}, indent=2)}
```
"""
    tag = f"{N_DOCS // 1000}k" if N_DOCS < 1_000_000 else f"{N_DOCS // 1_000_000}M"
    out_md = f"/root/repo/BENCH/AND_PRUNING_AB_{tag}.md"
    with open(out_md, "w") as fh:
        fh.write(md)
    print(f"wrote {out_md}")
    for name, r in results.items():
        print(f"  {name}: on {r['on_min_s']}s off {r['off_min_s']}s "
              f"-> {r['speedup']}x")


if __name__ == "__main__":
    main()
