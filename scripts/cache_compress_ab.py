"""A/B: spark.rdd.compress for the build's DISK_ONLY caches (1M docs).

Motivation (BENCH/SCALING_2_to_8_1M_r5postfix.md): at 1M docs the
per-phase scaling efficiencies split cleanly — docs_write 0.88 but
postings 0.50 and assign 0.47, with the wide level's postings phase
showing sys 6.5% + iowait 2.0%: disk-bound symptoms. Both build caches
(the ranged corpus holding the content column, the tokenized term/tf
arrays) go DISK_ONLY at 1M (cache fit estimate), and Spark writes
persisted blocks UNCOMPRESSED by default (`spark.rdd.compress=false`).
That disk traffic is a fixed I/O cost that does not shrink with added
cores — the classic non-scaling component.

Hypothesis: lz4-compressing cached blocks (`spark.rdd.compress=true`)
trades the fixed I/O bytes for CPU (which scales), lifting the wide
level's postings/assign phases.

Protocol: interleaved fresh-JVM trials at local[8], pinned (taskset
cpus 4-11, 8g heap), page-cache drop + clean-window wait before each,
arms alternating off/on, 2 trials per arm. Decision rule (registered
here before the run): flip the engine default to `true` iff the ON
arm's mean docs/s is >= 3% above the OFF arm's with no phase
regressing > 5%. The pair-efficiency consequence is then measured by
the normal pre-registered scaling campaign, not by this probe.

Usage: python scripts/cache_compress_ab.py [n_docs] [trials_per_arm]
Writes BENCH/CACHE_COMPRESS_AB_1M.md.
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

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TRIALS_PER_ARM = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CORES = int(os.environ.get("SPARK_GRAFT_AB_CORES", "8"))


def run_trial(compress: bool) -> dict:
    drop_page_cache()
    pre_fault = round(fault_cost_us(), 1)
    code = (
        "import sys, json; sys.path.insert(0, '/root/repo');\n"
        "import bench\n"
        f"r = bench.run(cores={CORES}, n_docs={N_DOCS}, quiet=True)\n"
        "print('RESULT ' + json.dumps(r))\n"
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_RDD_COMPRESS"] = "true" if compress else "false"
    env["SPARK_DRIVER_MEM"] = f"{CORES}g"
    env.setdefault("SPARK_GRAFT_BENCH_CORPUS_PARQUET", "/tmp/scaling_corpus")
    argv = ["taskset", "-c", f"4-{4 + CORES - 1}",
            sys.executable, "-c", code]
    out = subprocess.run(argv, capture_output=True, text=True, timeout=5400,
                         env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["pre_fault_us"] = pre_fault
            r["compress"] = compress
            return r
    raise RuntimeError(
        f"trial compress={compress} failed:\n{out.stderr[-3000:]}")


def main() -> None:
    trials: list[dict] = []
    order: list[bool] = []
    for t in range(TRIALS_PER_ARM):
        order += [False, True] if t % 2 == 0 else [True, False]
    for i, comp in enumerate(order):
        wait_for_clean_window()
        r = run_trial(comp)
        trials.append(r)
        ph = r["build"].get("phases", {})
        print(f"trial {i} compress={comp}: "
              f"{r['build']['docs_per_sec']} docs/s, "
              f"build {r['queries']['index_build']}s, phases "
              + json.dumps({k: v['wall_s'] for k, v in ph.items()}),
              flush=True)

    def arm(comp: bool) -> list[dict]:
        return [t for t in trials if t["compress"] == comp]

    def mean(xs):
        return sum(xs) / max(1, len(xs))

    lines = [
        f"# BENCH/CACHE_COMPRESS A/B — spark.rdd.compress at {N_DOCS:,} docs, "
        f"local[{CORES}] pinned",
        "",
        "See module docstring of `scripts/cache_compress_ab.py` for the",
        "pre-registered motivation and decision rule. Interleaved fresh-JVM",
        "trials, page-cache dropped, clean-window waited, pinned to "
        f"{CORES} cpus with {CORES}g heap.",
        "",
        "| trial | compress | docs/s | build s | assign s | docs_write s "
        "| postings s | build sys% | build iowait% | pre-fault |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    for i, t in enumerate(trials):
        ph = t["build"].get("phases", {})
        mix = t.get("build_cpu_mix", {})
        lines.append(
            f"| {i} | {t['compress']} | {t['build']['docs_per_sec']:,} "
            f"| {t['queries']['index_build']} "
            f"| {ph.get('assign', {}).get('wall_s', '?')} "
            f"| {ph.get('docs_write', {}).get('wall_s', '?')} "
            f"| {ph.get('postings', {}).get('wall_s', '?')} "
            f"| {mix.get('sys', '?')} | {mix.get('iowait', '?')} "
            f"| {t.get('pre_fault_us', '?')}us |"
        )
    m_off = mean([t["build"]["docs_per_sec"] for t in arm(False)])
    m_on = mean([t["build"]["docs_per_sec"] for t in arm(True)])
    ratio = m_on / m_off if m_off else float("nan")
    lines += [
        "",
        f"**Mean docs/s: OFF = {m_off:,.1f}, ON = {m_on:,.1f} "
        f"(ON/OFF = {ratio:.3f})**",
        "",
        "Raw JSON:",
        "",
        "```json",
        json.dumps({"n_docs": N_DOCS, "cores": CORES,
                    "mean_off": m_off, "mean_on": m_on, "ratio": ratio,
                    "trials": trials}, indent=2),
        "```",
    ]
    out_path = "/root/repo/BENCH/CACHE_COMPRESS_AB_1M.md"
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}; ON/OFF = {ratio:.3f}")


if __name__ == "__main__":
    main()
