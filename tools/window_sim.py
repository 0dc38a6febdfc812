"""Driver-gate simulation: the FIRST 50 registered queries under a
VANILLA SparkSession (bare ``local[8]`` builder — none of the engine's
session configs), compared against their DuckDB oracles at the
driver's scale.  This is the closest local rehearsal of the real
correctness gate (the driver never calls the engine session factory),
so it catches configs the engine assumed but the driver won't set.

Usage: python tools/window_sim.py [--sf-dir /root/testdata/sf0.01] [--n 50]

A PASS here is still only a local simulation — per the ledger
discipline rule, driver-gated tasks stay "driver pending" until the
round's CORRECTNESS_r{N}.json exists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_correctness import compare  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()

    import __spark_entry__ as entry
    from usda_food_data_pipeline_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    window = list(queries)[: args.n]
    n_ok = 0
    failures = []
    for name in window:
        res = compare(name, queries[name](spark, args.sf_dir), oracles.get(name), con)
        ok = bool(res.get("ok"))
        n_ok += ok
        if not ok:
            failures.append(res)
        print(json.dumps(res), flush=True)
    print(
        json.dumps(
            {
                "window": len(window),
                "green": n_ok,
                "failures": [f.get("query") for f in failures],
                "vanilla_session": True,
                "sf_dir": args.sf_dir,
            }
        )
    )
    return 0 if n_ok == len(window) else 1


if __name__ == "__main__":
    raise SystemExit(main())
