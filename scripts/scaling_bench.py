"""Two-cluster-size scaling run (BASELINE.json north_rule / SURVEY.md §6).

No real cluster exists in this sandbox, so N vs 4N executors is proxied by
local[8] vs local[32] on the SAME deterministic input (both runs share one
machine's memory bandwidth — a conservative proxy). Writes
BENCH/BASELINE.md with both throughputs and
eff = tput@local[32] / (4 * tput@local[8])  (target >= 0.8).

Usage: python scripts/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else int(
    os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000")
)


def run_at(cores: int) -> dict:
    """Each parallelism level gets a fresh JVM (subprocess)."""
    code = (
        "import sys, json; sys.path.insert(0, '/root/repo');\n"
        "import bench\n"
        f"r = bench.run(cores={cores}, n_docs={N_DOCS}, quiet=True)\n"
        "print('RESULT ' + json.dumps(r))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"bench at local[{cores}] failed:\n{out.stderr[-3000:]}")


def main() -> None:
    t0 = time.time()
    r8 = run_at(8)
    r32 = run_at(32)
    tput8 = r8["build"]["docs_per_sec"]
    tput32 = r32["build"]["docs_per_sec"]
    eff = tput32 / (4 * tput8)
    p8 = r8["build"]["postings_per_sec"]
    p32 = r32["build"]["postings_per_sec"]
    eff_p = p32 / (4 * p8)

    md = f"""# BENCH/BASELINE — measured engine numbers (two parallelism levels)

Scaling criterion (BASELINE.json north_rule): throughput scaling
efficiency >= 0.8 from N to 4N executors. No real cluster exists in this
sandbox, so the two "cluster sizes" are **local[8] vs local[32] on the
same machine and the same deterministic input** ({N_DOCS:,} synthetic docs,
seed 42 — FIXTURES.md §1). Both runs share one machine's memory bandwidth
and page cache, which makes this a conservative proxy for multi-executor
scaling (a real 4N-node cluster adds bandwidth with nodes).

| metric | local[8] (N) | local[32] (4N) | efficiency tput@4N / (4 x tput@N) |
| --- | --- | --- | --- |
| index build docs/sec | {tput8:,.1f} | {tput32:,.1f} | **{eff:.3f}** |
| index build postings/sec | {p8:,.1f} | {p32:,.1f} | {eff_p:.3f} |
| index build wall s | {r8['queries']['index_build']} | {r32['queries']['index_build']} | |
| query mean s (pruned, warm) | {r8['query_mean_s']} | {r32['query_mean_s']} | |
| query p95 s (pruned, warm) | {r8['query_p95_s']} | {r32['query_p95_s']} | |
| compression bytes_out/raw | {r8['build']['compression_ratio']:.4f} | {r32['build']['compression_ratio']:.4f} | |
| postings | {r8['build']['n_postings']:,} | | |

Per-query latencies (seconds, warm index, pruned BMW path):

| query | local[8] | local[32] |
| --- | --- | --- |
"""
    for name in r8["queries"]:
        if name == "index_build":
            continue
        md += f"| {name} | {r8['queries'][name]} | {r32['queries'].get(name, '')} |\n"
    md += f"""
Raw JSON:

```json
{json.dumps({'local8': r8, 'local32': r32, 'scaling_efficiency_docs': round(eff, 4), 'scaling_efficiency_postings': round(eff_p, 4)}, indent=2)}
```
"""
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as fh:
        fh.write(md)
    print(f"eff(docs/sec) = {eff:.3f}; eff(postings/sec) = {eff_p:.3f}; "
          f"wrote BENCH/BASELINE.md in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
