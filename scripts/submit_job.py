"""spark-submit entry point (BASELINE.json north_rule: "runs via
spark-submit --py-files on a multi-executor cluster at two cluster
sizes").

Package and submit:

    cd /root/repo && zip -r /tmp/nyu_engine.zip nyu_search_engine_spark
    spark-submit --py-files /tmp/nyu_engine.zip \
        scripts/submit_job.py build  --input <corpus_path> --out <index_root>
    spark-submit --py-files /tmp/nyu_engine.zip \
        scripts/submit_job.py search --index <index_root> --query "terms..." \
        [--mode AND|OR] [--k 10]
    spark-submit --py-files /tmp/nyu_engine.zip \
        scripts/submit_job.py search-batch --index <index_root> \
        --queries <file-of-query-lines> [--mode AND|OR] [--k 10] [--decorate]
    spark-submit --py-files /tmp/nyu_engine.zip \
        scripts/submit_job.py bench-synth --n-docs 100000 --out <index_root>

In cluster mode the session comes from spark-submit's conf (master,
executor counts — run at N and 4N executors for the scaling pair); locally
this falls back to the repo's local[] factory so the same script drives
both.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def _spark(args):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    try:
        # under spark-submit the builder inherits the submitted conf
        return SparkSession.builder.getOrCreate()
    except Exception:
        from nyu_search_engine_spark.session import get_spark

        return get_spark(app_name="submit_job")


def cmd_build(args) -> None:
    from nyu_search_engine_spark.plans.build_index import build_index

    spark = _spark(args)
    corpus = spark.read.parquet(args.input)
    m = build_index(spark, corpus, args.out, shard_size=args.shard_size,
                    n_groups=args.n_groups, resume=not args.no_resume)
    print(json.dumps(m))


def cmd_search(args) -> None:
    from nyu_search_engine_spark.plans.search import Query
    from nyu_search_engine_spark.plans.search_index import IndexSearcher

    spark = _spark(args)
    searcher = IndexSearcher(spark, args.index)
    q = Query.parse(args.query, mode=args.mode, k=args.k)
    for r in searcher.search(q, method=args.method).collect():
        print(json.dumps(r.asDict(), default=str))


def cmd_search_batch(args) -> None:
    """Answer a FILE of queries in one Spark job chain (the reference
    REPL's workload shape): one line per query, `--mode`/`--k` apply to
    every line. All queries ride a single lexicon probe + one postings
    scan via IndexSearcher.search_batch; output rows are (query_id, rank,
    doc_id, score[, repo, path, commit]) with query_id = 0-based line
    number, bitwise identical to running each line through `search`."""
    from nyu_search_engine_spark.plans.search import Query
    from nyu_search_engine_spark.plans.search_index import IndexSearcher

    spark = _spark(args)
    searcher = IndexSearcher(spark, args.index)
    with open(args.queries) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    batch = {
        i: Query.parse(ln, mode=args.mode, k=args.k) for i, ln in enumerate(lines)
    }
    mtpc = getattr(args, "max_terms_per_chunk", None)
    if mtpc and mtpc != "auto":
        mtpc = int(mtpc)
    res = searcher.search_batch(batch, decorate=args.decorate,
                                max_terms_per_chunk=mtpc or None)
    order = ["query_id", "rank"]
    for r in res.orderBy(*order).collect():
        print(json.dumps(r.asDict(), default=str))


def cmd_bench_synth(args) -> None:
    from nyu_search_engine_spark.plans.build_index import build_index
    from nyu_search_engine_spark.synth import synth_corpus

    spark = _spark(args)
    corpus = synth_corpus(spark, args.n_docs)
    m = build_index(spark, corpus, args.out, n_groups=args.n_groups)
    print(json.dumps(m))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True, help="corpus parquet/iceberg path")
    b.add_argument("--out", required=True, help="index root")
    b.add_argument("--shard-size", type=int, default=None,
                   help="explicit shard size; default = partition-as-shard fast mode")
    b.add_argument("--n-groups", type=int, default=4)
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--mode", default="OR", choices=["AND", "OR"])
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--method", default="pruned", choices=["pruned", "exhaustive"])
    s.set_defaults(fn=cmd_search)

    sb = sub.add_parser("search-batch")
    sb.add_argument("--index", required=True)
    sb.add_argument("--queries", required=True,
                    help="file of query lines (terms separated by spaces)")
    sb.add_argument("--mode", default="OR", choices=["AND", "OR"])
    sb.add_argument("--k", type=int, default=10)
    sb.add_argument("--decorate", action="store_true",
                    help="join (repo, path, commit) from the doc table")
    sb.add_argument("--max-terms-per-chunk", default=None,
                    help="bound distinct terms per scan chunk: an int, "
                         "or 'auto' (measured sweet spot, see "
                         "BENCH/BATCH_CHUNKING_500k.md)")
    sb.set_defaults(fn=cmd_search_batch)

    bs = sub.add_parser("bench-synth")
    bs.add_argument("--n-docs", type=int, default=100000)
    bs.add_argument("--out", required=True)
    bs.add_argument("--n-groups", type=int, default=4)
    bs.set_defaults(fn=cmd_bench_synth)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
