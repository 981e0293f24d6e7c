"""Interleaved fresh-JVM A/B: query-session scan-split floor.

Spark floors a scan's split count at defaultParallelism
(spark.sql.files.minPartitionNum unset), so the warm-index postings scan
(~80 MB in 32 files) is diced into ~16 splits per query — task-scheduling
overhead, not parallelism, for a sub-second job. Arm B sets
``spark.sql.files.minPartitionNum=1`` on the QUERY session only: split
count then derives from bytes (maxPartitionBytes, default 128 MB), which
is the scale-correct rule — a 10^12-row postings table still splits by
size; only the artificial floor for tiny scans is removed.

Usage: python scripts/query_scanconf_ab.py [n_pairs] [out.md]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INDEX_ROOT = "/tmp/r6_aqe_ab_idx"  # shared with exhaustive_aqe_ab.py

TRIAL_CODE = r"""
import json, sys, time, statistics
sys.path.insert(0, {repo!r})
from nyu_search_engine_spark.session import get_spark
from nyu_search_engine_spark.plans.search import Query
from nyu_search_engine_spark.plans.search_index import IndexSearcher

arm = sys.argv[1]
spark = get_spark(app_name="scan_ab", cores=16)
s = IndexSearcher(spark, {root!r})
if arm == "floor1":
    s.spark.conf.set("spark.sql.files.minPartitionNum", "1")
qs = {{
    "q_and_rare": Query(("rareterm00", "rareterm01"), "AND", 10),
    "q_and_hot": Query(("hotterm0", "hotterm1", "hotterm2"), "AND", 10),
    "q_or_mixed": Query(("hotterm0", "rareterm07"), "OR", 10),
    "q_or_hot": Query(("hotterm0", "hotterm1", "hotterm2", "hotterm3"), "OR", 10),
    "q_or_common": Query(("def", "return", "class"), "OR", 10),
}}
s.search(qs["q_and_rare"], "pruned", decorate=False)  # warm
out = {{}}
means = []
for rep in range(5):
    t0 = time.time()
    for q in qs.values():
        s.search(q, "pruned", decorate=False).collect()
    means.append((time.time() - t0) / len(qs))
out["mean_query_s"] = round(statistics.median(means), 4)
out["all"] = [round(m, 4) for m in means]
print(json.dumps(out))
spark.stop()
"""


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_md = sys.argv[2] if len(sys.argv) > 2 else "BENCH/QUERY_SCANCONF_AB_r6.md"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(INDEX_ROOT, "lexicon", "_SUCCESS")):
        from scripts.exhaustive_aqe_ab import build_index_once
        build_index_once()
    code = TRIAL_CODE.format(repo=repo, root=INDEX_ROOT)
    trials: dict[str, list[float]] = {"default": [], "floor1": []}
    t0 = time.time()
    for i in range(n_pairs):
        for arm in ("default", "floor1"):
            proc = subprocess.run(
                [sys.executable, "-c", code, arm],
                capture_output=True, text=True, timeout=600,
            )
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            trials[arm].append(r["mean_query_s"])
            print(f"pair {i} {arm}: {r}", flush=True)
    med = {arm: round(statistics.median(v), 4) for arm, v in trials.items()}
    ratio = round(med["floor1"] / med["default"], 3) if med["default"] else 0
    lines = [
        "# Query-session scan-split floor A/B (r6) — interleaved fresh JVMs",
        "",
        "Arms: `default` (split floor = defaultParallelism, ~16 splits over",
        "the 32-file warm postings scan) vs `floor1`",
        "(`spark.sql.files.minPartitionNum=1` on the query session: splits",
        "derive from bytes via maxPartitionBytes — scale-correct, only the",
        "artificial floor for tiny scans is removed).",
        f"{n_pairs} interleaved pairs, fresh JVM per trial, warm 100k index,",
        "5 reps x 5 pruned fixture queries per trial, per-trial medians.",
        "",
        f"| arm | median mean-query s |",
        f"| --- | --- |",
        f"| default | {med['default']} |",
        f"| floor1 | {med['floor1']} |",
        "",
        f"floor1/default = {ratio}",
        "",
        f"- default per-trial: {trials['default']}",
        f"- floor1 per-trial: {trials['floor1']}",
        "",
        f"Wall time: {round(time.time() - t0, 1)} s",
        "",
    ]
    with open(out_md, "w") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
