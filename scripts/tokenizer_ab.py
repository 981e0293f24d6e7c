"""Tokenizer A/B/C at large corpus size (VERDICT r2 #5).

The round-2 tradeoff (Arrow fused tokenize+tf beats JVM-occurrence
tokenize end-to-end at 100k docs because its cached per-doc rows are ~4x
smaller) is cache-size dependent; this script re-measures at >= 1M docs
where neither intermediate fits comfortably in memory, and adds the
third arm: tokens_tf_cols — pure-JVM fused tokenize+tf (no Python, one
row per (doc, term)).

Each (variant, trial) runs in a fresh JVM subprocess; trials are
interleaved across variants so a host-noise window cannot favor one arm.
Per run it reports docs-stage seconds, total build wall, docs/sec, and
the build-phase CPU mix (sys+steal gate like bench.py). Results go to
BENCH/TOKENIZER_AB.md.

A losing arm can lose by ORDERS of magnitude at this scale (the first
1M-doc run had jvm_tf still unfinished at 50 min vs arrow's 7.3-min full
build), so each run is wall-capped: a run that exceeds the cap is killed
and recorded as DNF at the cap — that IS the measurement.

Usage: python scripts/tokenizer_ab.py [n_docs] [n_trials] [cores] [variants]
Env:   SPARK_GRAFT_TOKAB_RUN_CAP_S (default 2700) per-run wall cap
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 16
VARIANTS = (sys.argv[4].split(",") if len(sys.argv) > 4
            else ["arrow", "jvm_tf", "jvm"])
RUN_CAP_S = float(os.environ.get("SPARK_GRAFT_TOKAB_RUN_CAP_S", "2700"))


CORPUS_PARQUET = f"/tmp/tok_ab_corpus_{N_DOCS}"


def materialize_corpus() -> None:
    """Write the synthetic corpus to parquet ONCE (own JVM): every arm
    then reads the same files — identical input bytes, no datagen cost in
    the timed window, and no 1M-doc corpus pinned on the 8g build heap
    (the deserialized persist OOMed the first capped run)."""
    if os.path.exists(os.path.join(CORPUS_PARQUET, "_SUCCESS")):
        return
    code = f"""
import sys
sys.path.insert(0, '/root/repo')
from nyu_search_engine_spark.session import get_spark
from nyu_search_engine_spark.synth import synth_corpus
spark = get_spark(app_name='tok_ab_gen', cores={CORES})
synth_corpus(spark, {N_DOCS}).write.mode('overwrite').parquet({CORPUS_PARQUET!r})
print('GENDONE')
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=3600)
    if "GENDONE" not in out.stdout:
        raise RuntimeError(f"corpus gen failed:\n{out.stderr[-3000:]}")


def run_one(tokenizer: str) -> dict:
    code = f"""
import sys, json, time, tempfile, shutil
sys.path.insert(0, '/root/repo')
from nyu_search_engine_spark.session import get_spark
from nyu_search_engine_spark.synth import synth_corpus
from nyu_search_engine_spark.plans.build_index import build_index

def cpu():
    with open('/proc/stat') as fh:
        return list(map(int, fh.readline().split()[1:9]))

spark = get_spark(app_name='tok_ab', cores={CORES})
corpus = spark.read.parquet({CORPUS_PARQUET!r})
warm = tempfile.mkdtemp(prefix='tok_ab_warm_')
build_index(spark, synth_corpus(spark, 2000), warm, n_groups=1,
            resume=False, tokenizer='{tokenizer}')
shutil.rmtree(warm, ignore_errors=True)
root = tempfile.mkdtemp(prefix='tok_ab_')
c0 = cpu(); t0 = time.time()
m = build_index(spark, corpus, root, n_groups=4, tokenizer='{tokenizer}',
                cache_input=False)
wall = time.time() - t0
c1 = cpu()
d = [b - a for a, b in zip(c0, c1)]
tot = max(1, sum(d))
names = ['user','nice','sys','idle','iowait','irq','softirq','steal']
mix = {{n: round(100*v/tot, 1) for n, v in zip(names, d)}}
shutil.rmtree(root, ignore_errors=True)
print('RESULT ' + json.dumps({{
    'tokenizer': '{tokenizer}', 'wall_s': round(wall, 1),
    'docs_stage_s': round(m['docs_stage_s'], 1),
    'docs_per_sec': round(m['n_docs']/wall, 1),
    'postings_per_sec': round(m['n_postings']/wall, 1),
    'n_postings': m['n_postings'],
    'sys_steal_pct': round(mix['sys'] + mix['steal'], 1)}}))
spark.stop()
"""
    # start_new_session puts the driver AND its JVM/worker children in
    # their own process group, so a timeout kills exactly this run's
    # process tree — never a concurrently running Spark session
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, start_new_session=True)
    try:
        stdout, stderr = proc.communicate(timeout=RUN_CAP_S)
    except subprocess.TimeoutExpired:
        import signal
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        time.sleep(5)
        return {"tokenizer": tokenizer, "dnf": True,
                "cap_s": round(RUN_CAP_S, 0)}
    out = subprocess.CompletedProcess(proc.args, proc.returncode,
                                      stdout, stderr)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    # a failed arm is a data point, not a harness crash: keep the full
    # stderr on disk and record the failure row
    errfile = f"/tmp/tok_ab_err_{tokenizer}_{int(time.time())}.log"
    with open(errfile, "w") as fh:
        fh.write(out.stderr)
    tail = [ln for ln in out.stderr.splitlines()
            if "Error" in ln or "Exception" in ln][:5]
    return {"tokenizer": tokenizer, "failed": True, "errfile": errfile,
            "err_tail": tail}


def main() -> None:
    t0 = time.time()
    materialize_corpus()
    print(f"corpus parquet ready at {CORPUS_PARQUET} "
          f"({time.time() - t0:.0f}s)", flush=True)
    results: dict[str, list[dict]] = {v: [] for v in VARIANTS}
    for t in range(N_TRIALS):
        for v in VARIANTS:
            r = run_one(v)
            results[v].append(r)
            if r.get("dnf"):
                print(f"trial {t} {v}: DNF (killed at {r['cap_s']}s wall cap)",
                      flush=True)
                continue
            if r.get("failed"):
                print(f"trial {t} {v}: FAILED ({r['err_tail']}; "
                      f"full stderr {r['errfile']})", flush=True)
                continue
            print(f"trial {t} {v}: {r['docs_per_sec']} docs/s, "
                  f"docs stage {r['docs_stage_s']}s, wall {r['wall_s']}s, "
                  f"noise {r['sys_steal_pct']}%", flush=True)

    rows = ""
    best = {}
    for v in VARIANTS:
        done = [r for r in results[v]
                if not r.get("dnf") and not r.get("failed")]
        best[v] = max(done, key=lambda r: r["docs_per_sec"]) if done else {
            **results[v][0], "docs_per_sec": 0.0}
        for i, r in enumerate(results[v]):
            if r.get("dnf"):
                rows += (f"| {v} trial {i} | DNF | — | >{r['cap_s']:.0f} "
                         f"(killed at cap) | — |\n")
            elif r.get("failed"):
                rows += (f"| {v} trial {i} | FAILED ({'; '.join(r['err_tail'][:1])}) "
                         f"| — | — | — |\n")
            else:
                rows += (f"| {v} trial {i} | {r['docs_per_sec']:,.1f} | "
                         f"{r['docs_stage_s']} | {r['wall_s']} | "
                         f"{r['sys_steal_pct']}% |\n")
    winner = max(best, key=lambda v: best[v]["docs_per_sec"])
    md = f"""# Tokenizer A/B/C at {N_DOCS:,} docs (local[{CORES}])

Three fused-tokenize strategies for the docs stage, measured end-to-end
(full index build, fresh JVM per run, trials interleaved across variants):

- **arrow** — mapInArrow batch kernel (r6): byte-level numpy tokenize +
  dictionary-encoded tf counting, Arrow list output (one (doc,term) row
  out). Before r6 this arm was a per-doc pandas UDF — those historical
  numbers live in this file's git history.
- **jvm_tf** — pure column expressions: array_sort + run-start diffs
  (one (doc,term) row out, zero Python)
- **jvm** — codegen tokenize only; tf counting happens in the assembly
  kernel's run-collapse (one row per token OCCURRENCE out)

| run | docs/sec | docs stage s | build wall s | sys+steal |
| --- | --- | --- | --- | --- |
{rows}
Best per variant: {json.dumps({v: best[v] for v in VARIANTS}, indent=2)}

**Winner at {N_DOCS:,} docs: {winner}** ({best[winner]['docs_per_sec']:,.1f}
docs/s best trial).
"""
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    tag = (f"{N_DOCS // 1000}k" if N_DOCS < 1_000_000
           else f"{N_DOCS // 1_000_000}M")
    out_md = f"/root/repo/BENCH/TOKENIZER_AB_{tag}.md"
    with open(out_md, "w") as fh:
        fh.write(md)
    print(f"winner: {winner}; wrote {out_md} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
