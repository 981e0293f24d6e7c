"""submit_job CLI: search-batch over a query file answers every line in
one Spark job chain, row-identical to per-query `search` (the reference
REPL's workload shape — a file of query lines)."""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo/scripts")

import submit_job  # noqa: E402

from nyu_search_engine_spark.plans.search import Query  # noqa: E402


def test_search_batch_cli_matches_single(spark, index_root, searcher,
                                         tmp_path, capsys):
    lines = ["hotterm0 rareterm07", "hotterm1 hotterm2", "def return"]
    qfile = tmp_path / "queries.txt"
    qfile.write_text("\n".join(lines) + "\n")

    args = argparse.Namespace(
        index=index_root, queries=str(qfile), mode="OR", k=5, decorate=False,
        max_terms_per_chunk="auto",  # exercises the CLI auto-chunk path
    )
    submit_job.cmd_search_batch(args)
    got = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]

    want = []
    for i, ln in enumerate(lines):
        q = Query.parse(ln, mode="OR", k=5)
        for r in searcher.search(q, method="pruned", decorate=False).collect():
            want.append({"query_id": i, "rank": r["rank"],
                         "doc_id": r["doc_id"], "score": r["score"]})
    want.sort(key=lambda d: (d["query_id"], d["rank"]))
    assert got == want


def test_search_batch_cli_and_mode_oov(spark, index_root, tmp_path, capsys):
    # an AND line with an OOV term contributes no rows; others unaffected
    qfile = tmp_path / "queries.txt"
    qfile.write_text("hotterm0 zzz_not_a_term\nhotterm0 hotterm1\n")
    args = argparse.Namespace(
        index=index_root, queries=str(qfile), mode="AND", k=3, decorate=False
    )
    submit_job.cmd_search_batch(args)
    got = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert got, "second line must produce rows"
    assert {d["query_id"] for d in got} == {1}
