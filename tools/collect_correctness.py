"""Assemble the three-scale local correctness attestation
(CORRECTNESS_LOCAL_r*.json): run the DuckDB-oracle gate for every
registered query at sf0.001 / sf0.01 / sf0.1 and collect the per-query
rows into one artifact.

Usage: python tools/collect_correctness.py --out CORRECTNESS_LOCAL_r08.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    result = {}
    rc = 0
    for sf in SCALES:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"),
             "--sf-dir", f"/root/testdata/{sf}"],
            capture_output=True, text=True, cwd=REPO,
        )
        rows = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
        total = next((r for r in rows if "total_failures" in r), {"total_failures": -1})
        queries = {r["query"]: r for r in rows if "query" in r}
        result[sf] = {
            "total_failures": total["total_failures"],
            "n_queries": len(queries),
            "n_match": sum(1 for r in queries.values() if r.get("status") == "match"),
            "n_rows_only": sum(
                1 for r in queries.values() if r.get("status") == "rows_only"
            ),
            "queries": queries,
        }
        if total["total_failures"]:
            rc = 1
        print(json.dumps({sf: {k: result[sf][k] for k in
                               ("total_failures", "n_queries", "n_match", "n_rows_only")}}),
              flush=True)
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)
    return rc


if __name__ == "__main__":
    sys.exit(main())
