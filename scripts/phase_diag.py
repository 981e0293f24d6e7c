"""One diagnostic pair with per-phase timings (scaling bottleneck hunt).

Runs bench.run at local[N] and local[4N] back-to-back (fresh JVM each,
same parquet corpus as the scaling protocol) and prints each build
phase's wall time at both levels plus its per-phase scaling efficiency
  eff_phase = wall@N / (4 x wall@4N)
A phase whose eff is far below 1 is the non-scaling component.

Optional CPU pinning (taskset) per trial via PIN=1 — the proxy-fidelity
mode evaluated for protocol v3: the whole process tree (JVM, GC/JIT
threads, pyspark daemons) is confined to exactly `cores` host CPUs, and
SPARK_DRIVER_MEM scales as 1g/core, matching how a real cluster's
resources scale with executor count.

Usage: [PIN=1] python scripts/phase_diag.py [n_docs] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from hostwindow import drop_page_cache, wait_for_clean_window  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
LEVEL_N = int(sys.argv[2]) if len(sys.argv) > 2 else 2
PIN = os.environ.get("PIN", "0") == "1"


def run_at(cores: int) -> dict:
    drop_page_cache()
    code = (
        "import sys, json; sys.path.insert(0, '/root/repo');\n"
        "import bench\n"
        f"r = bench.run(cores={cores}, n_docs={N_DOCS}, quiet=True)\n"
        "print('RESULT ' + json.dumps(r))\n"
    )
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_BENCH_CORPUS_PARQUET", "/tmp/scaling_corpus")
    argv = [sys.executable, "-c", code]
    if PIN:
        # pin the whole tree to `cores` host CPUs (skip cpu 0-3: host
        # housekeeping); heap scales 1g/core so per-core memory is equal
        # at both levels, as on a real cluster
        argv = ["taskset", "-c", f"4-{4 + cores - 1}"] + argv
        env["SPARK_DRIVER_MEM"] = f"{cores}g"
    out = subprocess.run(argv, capture_output=True, text=True, timeout=5400,
                         env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"local[{cores}] failed:\n{out.stderr[-3000:]}")


def main() -> None:
    lvl4 = 4 * LEVEL_N
    wait_for_clean_window()
    r_n = run_at(LEVEL_N)
    r_4 = run_at(lvl4)
    pn, p4 = r_n["build"]["phases"], r_4["build"]["phases"]
    build_n = r_n["queries"]["index_build"]
    build_4 = r_4["queries"]["index_build"]
    print(f"\nmode={'PINNED' if PIN else 'unpinned'} n_docs={N_DOCS}")
    print(f"build wall: local[{LEVEL_N}] {build_n:.1f}s  "
          f"local[{lvl4}] {build_4:.1f}s  "
          f"eff {build_n / (4 * build_4):.3f}\n")
    hdr = (f"{'phase':<14} {'N wall':>8} {'4N wall':>8} {'eff':>6} "
           f"{'N user%':>8} {'4N user%':>8} {'N idle%':>8} {'4N idle%':>8}")
    print(hdr)
    acc_n = acc_4 = 0.0
    for name in pn:
        a, b = pn[name], p4.get(name, {})
        acc_n += a.get("wall_s", 0.0)
        acc_4 += b.get("wall_s", 0.0)
        eff = a["wall_s"] / (4 * b["wall_s"]) if b.get("wall_s") else float("nan")
        print(f"{name:<14} {a.get('wall_s', 0):>8.1f} {b.get('wall_s', 0):>8.1f} "
              f"{eff:>6.3f} {a.get('user_pct', -1):>8.1f} "
              f"{b.get('user_pct', -1):>8.1f} {a.get('idle_pct', -1):>8.1f} "
              f"{b.get('idle_pct', -1):>8.1f}")
    print(f"{'(sum phases)':<14} {acc_n:>8.1f} {acc_4:>8.1f}   "
          f"gap N {build_n - acc_n:.1f}s / 4N {build_4 - acc_4:.1f}s")
    print("\nfull JSON:")
    print(json.dumps({"N": r_n, "4N": r_4}))


if __name__ == "__main__":
    main()
