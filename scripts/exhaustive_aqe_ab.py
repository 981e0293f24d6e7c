"""Interleaved fresh-JVM A/B: exhaustive query path under the AQE-off
sibling session (default) vs the caller's AQE-on session (query_aqe=True).

Closes VERDICT r5 #1: the r5 artifact (BENCH/QUERY_AQE_AB_100k.md) only
measured the 5 pruned-path fixture queries, while the exhaustive path is
the one query plan with a data-sized shuffle (decode->explode->hash agg),
i.e. exactly the shape AQE's coalescing exists for.

Protocol: one warm 100k-doc index on disk (built once); each TRIAL is a
fresh subprocess/JVM that constructs an IndexSearcher in the given arm,
runs one warm-up exhaustive query, then measures N repetitions of
  * q_or_mixed_exhaustive  (hotterm0, rareterm07) OR    — the bench query
  * q_and_hot_exhaustive   (hotterm0, hotterm1)  AND    — hot conjunctive
and prints per-query medians. Arms alternate (off, on, off, on, ...) so
host-noise drift hits both equally. Usage:

    python scripts/exhaustive_aqe_ab.py [n_pairs] [out.md]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INDEX_ROOT = "/tmp/r6_aqe_ab_idx"

TRIAL_CODE = r"""
import json, sys, time, statistics
sys.path.insert(0, {repo!r})
from nyu_search_engine_spark.session import get_spark
from nyu_search_engine_spark.plans.search import Query
from nyu_search_engine_spark.plans.search_index import IndexSearcher

aqe = sys.argv[1] == "on"
spark = get_spark(app_name="aqe_ab", cores=16)
s = IndexSearcher(spark, {root!r}, query_aqe=aqe)
qs = {{
    "q_or_mixed_exhaustive": Query(("hotterm0", "rareterm07"), "OR", 10),
    "q_and_hot_exhaustive": Query(("hotterm0", "hotterm1"), "AND", 10),
}}
s.search(qs["q_or_mixed_exhaustive"], "exhaustive", decorate=False)  # warm
out = {{}}
for name, q in qs.items():
    ts = []
    for _ in range(5):
        t0 = time.time()
        s.search(q, "exhaustive", decorate=False).collect()
        ts.append(time.time() - t0)
    out[name] = round(statistics.median(ts), 3)
    out[name + "_all"] = [round(t, 3) for t in ts]
print(json.dumps(out))
spark.stop()
"""


def build_index_once() -> None:
    if os.path.exists(os.path.join(INDEX_ROOT, "lexicon", "_SUCCESS")):
        return
    from nyu_search_engine_spark.plans.build_index import build_index
    from nyu_search_engine_spark.session import get_spark
    from nyu_search_engine_spark.synth import synth_corpus

    spark = get_spark(app_name="aqe_ab_build", cores=16)
    corpus = synth_corpus(spark, 100000).persist()
    corpus.count()
    build_index(spark, corpus, INDEX_ROOT, n_groups=1, resume=False)
    spark.stop()


def run_trial(arm: str) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = TRIAL_CODE.format(repo=repo, root=INDEX_ROOT)
    proc = subprocess.run(
        [sys.executable, "-c", code, arm],
        capture_output=True, text=True, timeout=600,
    )
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_md = sys.argv[2] if len(sys.argv) > 2 else "BENCH/QUERY_EXHAUSTIVE_AQE_AB_r6.md"
    build_index_once()
    trials: dict[str, list[dict]] = {"off": [], "on": []}
    t0 = time.time()
    for i in range(n_pairs):
        for arm in ("off", "on"):
            r = run_trial(arm)
            trials[arm].append(r)
            print(f"pair {i} arm {arm}: {json.dumps(r)}", flush=True)
    queries = ["q_or_mixed_exhaustive", "q_and_hot_exhaustive"]
    med = {
        arm: {q: round(statistics.median(t[q] for t in trials[arm]), 3)
              for q in queries}
        for arm in trials
    }
    lines = [
        "# Exhaustive-path AQE A/B (r6) — interleaved fresh JVMs",
        "",
        "Arms: `off` = AQE-off sibling session (engine default), `on` = the",
        "caller's AQE-on session (`IndexSearcher(query_aqe=True)`).",
        f"{n_pairs} interleaved pairs, one fresh JVM per trial, warm 100k-doc",
        "index on disk, 5 reps/query/trial, per-trial medians below;",
        "published number = median of per-trial medians.",
        "",
        "| query | AQE off (default) | AQE on | on/off |",
        "| --- | --- | --- | --- |",
    ]
    for q in queries:
        ratio = round(med["on"][q] / med["off"][q], 3) if med["off"][q] else 0
        lines.append(f"| {q} | {med['off'][q]} | {med['on'][q]} | {ratio} |")
    lines += ["", "Per-trial medians (chronological):", ""]
    for arm in ("off", "on"):
        for q in queries:
            vals = [t[q] for t in trials[arm]]
            lines.append(f"- {arm} {q}: {vals}")
    lines += ["", f"Wall time: {round(time.time() - t0, 1)} s", ""]
    with open(out_md, "w") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
