"""v3 scaling-campaign CONTINUATION (round 5).

Implements BENCH/SCALING_PROTOCOL.md "v3 continuation" (registered and
committed before this run): gates/unit/statistic/corpus/levels are the
UNCHANGED v3 protocol; the 2 clean pairs from the r4v3 run are carried
in as clean pairs #1–#2; this script appends pairs until 4 clean pairs
exist in total (or budget), then publishes the merged artifact with

  * every launched pair recorded (completed / crashed / dirty), with
    stderr tails for crashes;
  * a report-only mid-trial fault-cost series (sampled every 60 s by
    the unpinned parent on housekeeping cpus 0–3);
  * report-only per-phase efficiency columns per completed pair.

Trials run from a read-only git worktree pinned to the continuation
head so concurrent edits to /root/repo cannot leak into the measured
engine (which is byte-identical to r4v3's `f1df8b9`).

Usage: python scripts/scaling_bench_continue.py [worktree_dir]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo/scripts")
from hostwindow import drop_page_cache, fault_cost_us, wait_for_clean_window  # noqa: E402

WORKTREE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine_r5"
PRIOR_MD = "/root/repo/BENCH/SCALING_2_to_8_500k_r4v3.md"
OUT_MD = "/root/repo/BENCH/SCALING_2_to_8_500k_r5.md"
N_DOCS = 500_000
LEVEL_N, LEVEL_4N = 2, 8
NOISE_THRESHOLD_PCT = 15.0
FAULT_GATE_US = 20.0
TARGET_CLEAN_PAIRS = 4
BUDGET_S = float(os.environ.get("SPARK_GRAFT_SCALE_BUDGET_S", "9000"))
MAX_PAIRS = 10
HOST_CPUS = os.cpu_count() or 32
PHASES = ("assign", "docs_write", "postings", "lexicon")


def load_prior_pairs() -> tuple[list[dict], str]:
    """Carried-in clean pairs from the r4v3 artifact's raw-JSON block."""
    text = open(PRIOR_MD).read()
    blob = json.loads(re.search(r"```json\n(.*)\n```", text, re.S).group(1))
    pairs = []
    for p in blob["pairs"]:
        t = blob["trials"][f"pair{p['idx']}"]
        pairs.append({**p, "trialN": t["N"], "trial4N": t["4N"],
                      "campaign": "r4v3"})
    return pairs, blob["engine_commit"]


def noise_of(r: dict) -> float:
    b, q = r.get("build_cpu_mix", {}), r.get("query_cpu_mix", {})
    return round(max(b.get("sys", 0.0) + b.get("steal", 0.0),
                     q.get("sys", 0.0) + q.get("steal", 0.0)), 1)


def util_of(r: dict) -> float:
    b = r.get("build_cpu_mix", {})
    return round(b.get("user", 0.0) * HOST_CPUS / max(1, r["cores"]), 1)


def is_clean(r: dict) -> bool:
    return (noise_of(r) <= NOISE_THRESHOLD_PCT
            and r.get("pre_fault_us", 0.0) <= FAULT_GATE_US)


class _FaultSeries(threading.Thread):
    """Report-only mid-trial probe; pinned to housekeeping cpus 0-3."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.samples: list[list[float]] = []
        self._stop = threading.Event()

    def run(self) -> None:
        try:
            os.sched_setaffinity(0, {0, 1, 2, 3})
        except OSError:
            pass
        t0 = time.time()
        while not self._stop.wait(60.0):
            self.samples.append([round(time.time() - t0, 0),
                                 round(fault_cost_us(), 1)])

    def stop(self) -> list[list[float]]:
        self._stop.set()
        return self.samples


def run_at(cores: int) -> dict:
    drop_page_cache()
    pre_fault = round(fault_cost_us(), 1)
    code = (
        f"import sys, json; sys.path.insert(0, {WORKTREE!r});\n"
        "import bench\n"
        f"r = bench.run(cores={cores}, n_docs={N_DOCS}, quiet=True)\n"
        "print('RESULT ' + json.dumps(r))\n"
    )
    env = dict(os.environ)
    env["SPARK_DRIVER_MEM"] = f"{cores}g"
    argv = ["taskset", "-c", f"4-{4 + cores - 1}",
            sys.executable, "-c", code]
    probe = _FaultSeries()
    probe.start()
    try:
        out = subprocess.run(argv, capture_output=True, text=True,
                             timeout=5400, env=env)
    finally:
        series = probe.stop()
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["pre_fault_us"] = pre_fault
            r["mid_trial_fault_us"] = series
            return r
    raise RuntimeError(
        f"bench at local[{cores}] failed (pre-fault {pre_fault}us, "
        f"mid-trial faults {series}):\n{out.stderr[-2500:]}")


def phase_effs(p: dict) -> dict:
    """Per-phase throughput efficiency: wall_N / (4 * wall_4N)."""
    out = {}
    for ph in PHASES:
        try:
            wn = p["trialN"]["build"]["phases"][ph]["wall_s"]
            w4 = p["trial4N"]["build"]["phases"][ph]["wall_s"]
            out[ph] = round(wn / (4 * w4), 3)
        except (KeyError, ZeroDivisionError):
            out[ph] = None
    return out


def main() -> None:
    t0 = time.time()
    os.environ.setdefault("SPARK_GRAFT_BENCH_CORPUS_PARQUET",
                          "/tmp/scaling_corpus")
    prior_pairs, prior_commit = load_prior_pairs()
    commit = subprocess.run(
        ["git", "-C", WORKTREE, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    n_prior_clean = sum(p["clean"] for p in prior_pairs)
    print(f"carried in {len(prior_pairs)} pairs ({n_prior_clean} clean) "
          f"from {PRIOR_MD} @ {prior_commit}; continuation engine {commit}",
          flush=True)

    pairs: list[dict] = list(prior_pairs)
    failures: list[dict] = []
    # continuation pair indices continue after the r4v3 campaign's 0-7
    next_idx = 8
    for t in range(MAX_PAIRS):
        n_clean = sum(p["clean"] for p in pairs)
        if n_clean >= TARGET_CLEAN_PAIRS:
            break
        if time.time() - t0 > BUDGET_S:
            print("budget exhausted", flush=True)
            break
        wait_for_clean_window()
        order = (LEVEL_N, LEVEL_4N) if t % 2 == 0 else (LEVEL_4N, LEVEL_N)
        idx = next_idx
        next_idx += 1
        by_level: dict[int, dict] = {}
        failed = False
        for cores in order:
            try:
                r = run_at(cores)
            except (RuntimeError, subprocess.TimeoutExpired) as exc:
                print(f"pair {idx} local[{cores}] FAILED: {exc}", flush=True)
                failures.append({"idx": idx, "level": cores,
                                 "order": f"{order[0]}->{order[1]}",
                                 "error": str(exc)[:3000]})
                failed = True
                break
            by_level[cores] = r
            print(f"pair {idx} local[{cores}]: "
                  f"{r['build']['docs_per_sec']} docs/s, "
                  f"build {r['queries']['index_build']}s, "
                  f"query mean {r['query_mean_s']}s, "
                  f"noise {noise_of(r)}%, util {util_of(r)}%, "
                  f"pre-fault {r['pre_fault_us']}us, "
                  f"mid-trial faults {r['mid_trial_fault_us']} "
                  f"({'clean' if is_clean(r) else 'DIRTY'})", flush=True)
        if failed:
            continue
        rN, r4 = by_level[LEVEL_N], by_level[LEVEL_4N]
        pair = {
            "idx": idx,
            "order": f"{order[0]}->{order[1]}",
            "trialN": rN, "trial4N": r4,
            "clean": is_clean(rN) and is_clean(r4),
            "eff_docs": r4["build"]["docs_per_sec"]
            / (4 * rN["build"]["docs_per_sec"]),
            "eff_postings": r4["build"]["postings_per_sec"]
            / (4 * rN["build"]["postings_per_sec"]),
            "campaign": "r5",
        }
        pairs.append(pair)
        print(f"pair {idx}: eff {pair['eff_docs']:.3f} "
              f"({'clean' if pair['clean'] else 'dirty'}); "
              f"{sum(p['clean'] for p in pairs)}/{TARGET_CLEAN_PAIRS} "
              f"clean pairs total", flush=True)

    clean_pairs = [p for p in pairs if p["clean"]][:TARGET_CLEAN_PAIRS]
    effs = [p["eff_docs"] for p in clean_pairs]
    effs_p = [p["eff_postings"] for p in clean_pairs]
    underpowered = len(clean_pairs) < TARGET_CLEAN_PAIRS
    mean_eff = sum(effs) / len(effs) if effs else float("nan")
    mean_eff_p = sum(effs_p) / len(effs_p) if effs_p else float("nan")

    pair_rows = ""
    for p in pairs:
        inc = ("headline" if p in clean_pairs
               else ("clean (beyond first 4)" if p["clean"]
                     else "dirty — excluded"))
        pe = phase_effs(p)
        pair_rows += (
            f"| {p['idx']} | {p['campaign']} | {p['order']} | "
            f"{p['trialN']['build']['docs_per_sec']:,.1f} | "
            f"{p['trial4N']['build']['docs_per_sec']:,.1f} | "
            f"{p['eff_docs']:.3f} | {p['eff_postings']:.3f} | "
            + " | ".join("—" if pe[ph] is None else f"{pe[ph]:.3f}"
                         for ph in PHASES)
            + f" | {inc} |\n")
    trial_rows = ""
    for p in pairs:
        for lvl, r in ((LEVEL_N, p["trialN"]), (LEVEL_4N, p["trial4N"])):
            mid = r.get("mid_trial_fault_us")
            mid_s = ("n/a (r4v3)" if mid is None else
                     ("—" if not mid else
                      f"{min(x[1] for x in mid)}–{max(x[1] for x in mid)}us"
                      f" (n={len(mid)})"))
            trial_rows += (
                f"| pair {p['idx']} ({p['order']}) local[{lvl}] | "
                f"{r['build']['docs_per_sec']:,.1f} | "
                f"{r['queries']['index_build']} | {r['query_mean_s']} | "
                f"{noise_of(r)}% | {util_of(r)}% | {r['pre_fault_us']}us | "
                f"{mid_s} | {'clean' if is_clean(r) else 'dirty'} |\n")
    fail_rows = "".join(
        f"| {f['idx']} | local[{f['level']}] | {f['order']} | "
        f"{f['error'].splitlines()[0][:120]} |\n" for f in failures) \
        or "| — | — | — | none |\n"

    md = f"""# BENCH/SCALING (round 5) — protocol v3 completed to 4 clean pairs

Protocol: BENCH/SCALING_PROTOCOL.md v3 + the pre-registered
"v3 continuation" note (gates/unit/statistic UNCHANGED). Clean pairs
#1–#2 are carried in from the r4v3 campaign (engine `{prior_commit}`);
continuation pairs ran from a pinned worktree at `{commit}`, whose
engine code is byte-identical (only driver artifact files differ).
Unit = interleaved same-window pair local[{LEVEL_N}]+local[{LEVEL_4N}]
back-to-back on identical input ({N_DOCS:,} synthetic docs, seed 42,
shared 32-file parquet corpus, cache_input=False), in-pair order
alternating, process tree pinned with `taskset` to exactly its core
count, SPARK_DRIVER_MEM = 1g/core; trial clean iff build- and
query-phase sys+steal <= {NOISE_THRESHOLD_PCT}% AND pre-trial
first-touch fault probe <= {FAULT_GATE_US} us/page; headline = MEAN
per-pair docs/sec efficiency over the FIRST {TARGET_CLEAN_PAIRS} clean
pairs in global execution order.

**Headline: mean eff = {mean_eff:.3f}** over {len(clean_pairs)} clean
pairs (spread {min(effs, default=float('nan')):.3f}–{max(effs, default=float('nan')):.3f});
postings/sec mean eff = {mean_eff_p:.3f}.
Under-powered (fewer than {TARGET_CLEAN_PAIRS} clean pairs): {underpowered}.
Target (BASELINE.json): >= 0.8.

Per-pair efficiencies (phase eff = wall_N / (4 x wall_4N), report-only):

| pair | campaign | order | docs/s @N | docs/s @4N | eff docs | eff postings | eff assign | eff docs_write | eff postings-phase | eff lexicon | status |
| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |
{pair_rows}
All completed trials (execution order; mid-trial fault series is the
report-only 60 s probe registered in the continuation note):

| run | docs/sec | build s | query mean s | max sys+steal | build thread util | pre-fault | mid-trial fault range | window |
| --- | --- | --- | --- | --- | --- | --- | --- | --- |
{trial_rows}
Launch failures (every launched-but-not-completed pair, per the
continuation note's failure-accounting rule):

| pair | level | order | first error line |
| --- | --- | --- | --- |
{fail_rows}
Raw JSON:

```json
{json.dumps({'pairs': [{k: v for k, v in p.items() if k not in ('trialN', 'trial4N')} for p in pairs],
             'phase_effs': {f"pair{p['idx']}": phase_effs(p) for p in pairs},
             'failures': failures,
             'mean_eff_docs': None if not effs else round(mean_eff, 4),
             'mean_eff_postings': None if not effs_p else round(mean_eff_p, 4),
             'n_clean_pairs': len(clean_pairs),
             'underpowered': underpowered,
             'engine_commit': commit,
             'prior_engine_commit': prior_commit,
             'pinned': True,
             'trials': {f"pair{p['idx']}": {'N': p['trialN'], '4N': p['trial4N']} for p in pairs}},
            indent=2)}
```
"""
    with open(OUT_MD, "w") as fh:
        fh.write(md)
    print(f"mean eff(docs/sec) = {mean_eff:.3f} over {len(clean_pairs)} "
          f"clean pairs; underpowered = {underpowered}; wrote {OUT_MD} in "
          f"{time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
