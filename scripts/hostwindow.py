"""Shared clean-host-window probing for the bench scripts.

This sandbox is a shared-host VM with two distinct degradation modes
(BENCH/BASELINE.md "host memory cliff"):
  * ambient hypervisor CPU steal fluctuating 0.9-13% on a minutes
    timescale with the guest idle;
  * a ~16 GiB host fast-backing watermark — first-touch minor faults
    cost ~3.5us below it and 50-900us above it (or in degraded host
    windows), turning memory-allocating Spark stages kernel-bound.

A trial started in either state is guaranteed dirty AND slow, so the
bench scripts probe BOTH signals before paying minutes for a doomed run,
and every published trial carries its own /proc/stat windows.
"""

from __future__ import annotations

import os
import time


def cpu_sample() -> list[int]:
    with open("/proc/stat") as fh:
        return list(map(int, fh.readline().split()[1:9]))


def cpu_mix(before: list[int], after: list[int]) -> dict:
    names = ["user", "nice", "sys", "idle", "iowait", "irq", "softirq", "steal"]
    d = [b - a for a, b in zip(before, after)]
    tot = max(1, sum(d))
    return {n: round(100 * v / tot, 1) for n, v in zip(names, d)
            if n in ("user", "sys", "idle", "iowait", "steal")}


def ambient_steal_pct(window_s: float = 8.0) -> float:
    a = cpu_sample()
    time.sleep(window_s)
    b = cpu_sample()
    d = [y - x for x, y in zip(a, b)]
    return 100.0 * d[7] / max(1, sum(d))


def fault_cost_us(probe_mb: int = 64) -> float:
    """First-touch minor-fault cost in microseconds per 4 KiB page."""
    import mmap
    n = probe_mb * 1024 * 1024
    m = mmap.mmap(-1, n)
    t0 = time.time()
    for off in range(0, n, 4096):
        m[off] = 1
    dt = time.time() - t0
    m.close()
    return 1e6 * dt / (n // 4096)


def drop_page_cache() -> None:
    """Stale page cache counts toward the host's fast-backing watermark."""
    try:
        os.system("sync")
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3")
    except Exception:
        pass


def wait_for_clean_window(max_wait_s: float = 1800.0,
                          steal_limit: float = 3.0,
                          fault_limit_us: float = 15.0) -> bool:
    """Poll until ambient steal AND first-touch fault cost are low."""
    t0 = time.time()
    drop_page_cache()
    while True:
        s = ambient_steal_pct()
        f = fault_cost_us()
        if s <= steal_limit and f <= fault_limit_us:
            return True
        if time.time() - t0 > max_wait_s:
            print(f"no clean window in {max_wait_s:.0f}s (steal {s:.1f}%, "
                  f"fault {f:.1f}us) — proceeding anyway", flush=True)
            return False
        print(f"waiting: ambient steal {s:.1f}% (limit {steal_limit}) / "
              f"fault cost {f:.1f}us (limit {fault_limit_us})", flush=True)
        time.sleep(45)
