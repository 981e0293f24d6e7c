"""Two-cluster-size scaling run (BASELINE.json north_rule / SURVEY.md §6).

Implements the PRE-REGISTERED protocol in BENCH/SCALING_PROTOCOL.md,
**amendment v3** (committed before any v3 run):

* CPU fidelity: each trial's whole process tree (JVM task/GC/JIT
  threads, pyspark daemons, driver) runs under ``taskset -c
  4..(4+c-1)`` — exactly c host CPUs, matching a cluster whose size IS
  its CPU count (v2 measured local[2] consuming 109-120% of its nominal
  allocation via helper threads on free host cores).
* Memory fidelity: SPARK_DRIVER_MEM = 1g x c, so per-core memory is
  constant across levels as on a real cluster.
* Cleanliness: a trial is clean iff build- and query-phase sys+steal
  <= 15% AND the pre-trial first-touch fault probe (after a page-cache
  drop, immediately before launch) reads <= 20 us/page. Thread
  utilization is recorded and reported but does NOT gate (v2's 75%
  floor excluded the engine's own steady state — selection on the
  dependent variable).
* Unit/statistic unchanged: interleaved same-window pairs local[N] +
  local[4N], in-pair order alternating; headline = MEAN per-pair
  docs/sec efficiency over the first 4 clean pairs in execution order,
  min-max spread, all trials published; under-powered flag if the
  budget expires first.

Usage: python scripts/scaling_bench.py [n_docs] [max_pairs]
Env:   SPARK_GRAFT_SCALE_N (default 2), SPARK_GRAFT_SCALE_BUDGET_S
       (default 10800), SPARK_GRAFT_SCALE_CLEAN_PAIRS (default 4),
       SPARK_GRAFT_SCALE_TAG (artifact suffix, default r4v3),
       SPARK_GRAFT_SCALE_PIN=0 to disable pinning (v2 behavior)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from hostwindow import drop_page_cache, fault_cost_us, wait_for_clean_window  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else int(
    os.environ.get("SPARK_GRAFT_BENCH_DOCS", "500000")
)
MAX_PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
# parallelism pair: N and 4N. Default 2->8: the largest pair this
# shared-host VM can schedule cleanly (see BENCH/BASELINE.md diagnosis).
LEVEL_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
LEVEL_4N = 4 * LEVEL_N
NOISE_THRESHOLD_PCT = 15.0
FAULT_GATE_US = 20.0  # amendment v3: pre-trial host-memory probe gate
BUDGET_S = float(os.environ.get("SPARK_GRAFT_SCALE_BUDGET_S", "10800"))
TARGET_CLEAN_PAIRS = int(os.environ.get("SPARK_GRAFT_SCALE_CLEAN_PAIRS", "4"))
TAG_VER = os.environ.get("SPARK_GRAFT_SCALE_TAG", "r4v3")
PIN = os.environ.get("SPARK_GRAFT_SCALE_PIN", "1") == "1"


def run_at(cores: int) -> dict:
    """Each run gets a fresh JVM (subprocess), pinned to `cores` CPUs."""
    drop_page_cache()
    pre_fault = round(fault_cost_us(), 1)
    code = (
        "import sys, json; sys.path.insert(0, '/root/repo');\n"
        "import bench\n"
        f"r = bench.run(cores={cores}, n_docs={N_DOCS}, quiet=True)\n"
        "print('RESULT ' + json.dumps(r))\n"
    )
    env = dict(os.environ)
    argv = [sys.executable, "-c", code]
    if PIN:
        # cpus 0-3 are left for host housekeeping so the pinned set is
        # not sharing with kernel threads any more than a real node would
        argv = ["taskset", "-c", f"4-{4 + cores - 1}"] + argv
        env["SPARK_DRIVER_MEM"] = f"{cores}g"
    out = subprocess.run(argv, capture_output=True, text=True, timeout=5400,
                         env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["pre_fault_us"] = pre_fault
            return r
    raise RuntimeError(f"bench at local[{cores}] failed:\n{out.stderr[-3000:]}")


HOST_CPUS = os.cpu_count() or 32


def noise_of(r: dict) -> float:
    b = r.get("build_cpu_mix", {})
    q = r.get("query_cpu_mix", {})
    return round(max(b.get("sys", 0.0) + b.get("steal", 0.0),
                     q.get("sys", 0.0) + q.get("steal", 0.0)), 1)


def util_of(r: dict) -> float:
    """Build-phase utilization of the REQUESTED threads: /proc/stat user%
    is normalized over all host CPUs, so a healthy local[c] build shows
    user ~= c/HOST_CPUS. Reported per trial; NOT a gate (v3)."""
    b = r.get("build_cpu_mix", {})
    return round(b.get("user", 0.0) * HOST_CPUS / max(1, r["cores"]), 1)


def is_clean(r: dict) -> bool:
    return (noise_of(r) <= NOISE_THRESHOLD_PCT
            and r.get("pre_fault_us", 0.0) <= FAULT_GATE_US)


def main() -> None:
    t0 = time.time()
    # both levels ALWAYS build from the shared parquet corpus (bench.py
    # SPARK_GRAFT_BENCH_CORPUS_PARQUET, cache_input=False) — identical
    # input bytes for every trial, the input_hint's columnar shape
    os.environ.setdefault("SPARK_GRAFT_BENCH_CORPUS_PARQUET",
                          "/tmp/scaling_corpus")
    commit = subprocess.run(
        ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True).stdout.strip()

    pairs: list[dict] = []
    for t in range(MAX_PAIRS):
        if time.time() - t0 > BUDGET_S:
            print("budget exhausted", flush=True)
            break
        # same-window pair: wait for a clean ambient window ONCE, then run
        # both trials back-to-back; in-pair order alternates so monotonic
        # host drift cancels in expectation (SCALING_PROTOCOL.md)
        wait_for_clean_window()
        order = (LEVEL_N, LEVEL_4N) if t % 2 == 0 else (LEVEL_4N, LEVEL_N)
        by_level: dict[int, dict] = {}
        try:
            for cores in order:
                r = run_at(cores)
                by_level[cores] = r
                print(f"pair {t} local[{cores}]: "
                      f"{r['build']['docs_per_sec']} docs/s, "
                      f"build {r['queries']['index_build']}s, "
                      f"query mean {r['query_mean_s']}s, "
                      f"noise {noise_of(r)}%, util {util_of(r)}%, "
                      f"pre-fault {r['pre_fault_us']}us "
                      f"({'clean' if is_clean(r) else 'DIRTY'})",
                      flush=True)
        except RuntimeError as exc:
            print(f"pair {t} FAILED: {exc}", flush=True)
            continue
        rN, r4 = by_level[LEVEL_N], by_level[LEVEL_4N]
        pair = {
            "idx": t,
            "order": f"{order[0]}->{order[1]}",
            "trialN": rN,
            "trial4N": r4,
            "clean": is_clean(rN) and is_clean(r4),
            "eff_docs": rN and r4 and r4["build"]["docs_per_sec"]
            / (4 * rN["build"]["docs_per_sec"]),
            "eff_postings": r4["build"]["postings_per_sec"]
            / (4 * rN["build"]["postings_per_sec"]),
        }
        pairs.append(pair)
        clean_pairs = [p for p in pairs if p["clean"]]
        print(f"pair {t}: eff {pair['eff_docs']:.3f} "
              f"({'clean' if pair['clean'] else 'dirty'}); "
              f"{len(clean_pairs)}/{TARGET_CLEAN_PAIRS} clean pairs",
              flush=True)
        if len(clean_pairs) >= TARGET_CLEAN_PAIRS:
            break

    clean_pairs = [p for p in pairs if p["clean"]][:TARGET_CLEAN_PAIRS]
    effs = [p["eff_docs"] for p in clean_pairs]
    effs_p = [p["eff_postings"] for p in clean_pairs]
    underpowered = len(clean_pairs) < TARGET_CLEAN_PAIRS
    mean_eff = sum(effs) / len(effs) if effs else float("nan")
    mean_eff_p = sum(effs_p) / len(effs_p) if effs_p else float("nan")

    trial_rows = ""
    for p in pairs:
        for lvl, r in ((LEVEL_N, p["trialN"]), (LEVEL_4N, p["trial4N"])):
            trial_rows += (
                f"| pair {p['idx']} ({p['order']}) local[{lvl}] | "
                f"{r['build']['docs_per_sec']:,.1f} | "
                f"{r['queries']['index_build']} | {r['query_mean_s']} | "
                f"{noise_of(r)}% | {util_of(r)}% | {r['pre_fault_us']}us | "
                f"{'clean' if is_clean(r) else 'dirty'} |\n"
            )
    pair_rows = ""
    for p in pairs:
        inc = "headline" if p in clean_pairs else (
            "clean (beyond first 4)" if p["clean"] else "dirty — excluded")
        pair_rows += (
            f"| {p['idx']} | {p['order']} | "
            f"{p['trialN']['build']['docs_per_sec']:,.1f} | "
            f"{p['trial4N']['build']['docs_per_sec']:,.1f} | "
            f"{p['eff_docs']:.3f} | {p['eff_postings']:.3f} | {inc} |\n"
        )

    md = f"""# BENCH/SCALING (round 4, protocol v3) — pinned CPUs, same-window pairs

Protocol: BENCH/SCALING_PROTOCOL.md amendment v3 (committed before this
run). Engine commit: `{commit}`. Unit = interleaved same-window pair
local[{LEVEL_N}]+local[{LEVEL_4N}] back-to-back on identical input
({N_DOCS:,} synthetic docs, seed 42, shared parquet corpus,
cache_input=False), in-pair order alternating; each trial's process
tree pinned with `taskset` to exactly its core count
(pinning={'on' if PIN else 'OFF'}) with SPARK_DRIVER_MEM = 1g/core;
trial clean iff build- and query-phase sys+steal <=
{NOISE_THRESHOLD_PCT}% AND pre-trial first-touch fault probe <=
{FAULT_GATE_US} us/page (thread utilization reported, not gating);
headline = MEAN per-pair efficiency over the first
{TARGET_CLEAN_PAIRS} clean pairs.

**Headline: mean eff = {mean_eff:.3f}** over {len(clean_pairs)} clean
pairs (spread {min(effs, default=float('nan')):.3f}–{max(effs, default=float('nan')):.3f});
postings/sec mean eff = {mean_eff_p:.3f}.
Under-powered (fewer than {TARGET_CLEAN_PAIRS} clean pairs): {underpowered}.
Target (BASELINE.json): >= 0.8.

Per-pair efficiencies:

| pair | order | docs/s @local[{LEVEL_N}] | docs/s @local[{LEVEL_4N}] | eff docs | eff postings | status |
| --- | --- | --- | --- | --- | --- | --- |
{pair_rows}
All trials (execution order):

| run | docs/sec | build s | query mean s | max(build,query) sys+steal | build thread util | pre-fault | window |
| --- | --- | --- | --- | --- | --- | --- | --- |
{trial_rows}
Raw JSON:

```json
{json.dumps({'pairs': [{k: v for k, v in p.items() if k not in ('trialN', 'trial4N')} for p in pairs],
             'mean_eff_docs': None if not effs else round(mean_eff, 4),
             'mean_eff_postings': None if not effs_p else round(mean_eff_p, 4),
             'n_clean_pairs': len(clean_pairs),
             'underpowered': underpowered,
             'engine_commit': commit,
             'pinned': PIN,
             'trials': {f"pair{p['idx']}": {'N': p['trialN'], '4N': p['trial4N']} for p in pairs}},
            indent=2)}
```
"""
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    tag = f"{N_DOCS // 1000}k" if N_DOCS < 1_000_000 else f"{N_DOCS // 1_000_000}M"
    out_md = f"/root/repo/BENCH/SCALING_{LEVEL_N}_to_{LEVEL_4N}_{tag}_{TAG_VER}.md"
    with open(out_md, "w") as fh:
        fh.write(md)
    print(f"mean eff(docs/sec) = {mean_eff:.3f} over {len(clean_pairs)} clean "
          f"pairs; underpowered = {underpowered}; wrote {out_md} in "
          f"{time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
