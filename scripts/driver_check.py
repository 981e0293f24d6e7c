"""Local replica of the driver's queries()/oracle_sql() comparison.

Runs every entry at sf0.01 (like CORRECTNESS_r{N}.json): row count, column
names, and an order-insensitive value comparison (columns sorted by name,
rows sorted, values stringified with float rounding)."""

from __future__ import annotations

import importlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# sf-dependent oracles (IVF centroid literals) must train on the SAME sf
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    rows = [tuple(cell(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(rows)


def main() -> None:
    e = importlib.import_module("__spark_entry__")
    from nyu_search_engine_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            mine = fn(spark, SF).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in osql:
            print(f"rows-only {name}: {len(mine)} rows ({dt:.1f}s)")
            continue
        try:
            orc = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:200]}")
            n_fail += 1
            continue
        if sorted(mine.columns) != sorted(orc.columns):
            print(f"FAIL {name}: columns {sorted(mine.columns)} vs {sorted(orc.columns)}")
            n_fail += 1
            continue
        a, b = canon(mine), canon(orc)
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(a)} rows ({dt:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
