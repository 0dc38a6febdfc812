"""Superlinearity smoke over two bench runs at different scales.

Takes the sf0.1 reference timings and an sf1 bench line (10x data),
emits BENCH_LOCAL_sf1.json: per-query times, the sf1/sf0.1 ratio, and a
flag for any query growing more than --max-ratio (default 15x, i.e.
clearly superlinear after allowing constant overheads to amortize the
other way).

Usage: python tools/scale_report.py --base bench_sf01.json \
        --scaled bench_sf1.json --out BENCH_LOCAL_sf1.json
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="bench JSON line at the base sf")
    ap.add_argument("--scaled", required=True, help="bench JSON line at the scaled sf")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-ratio", type=float, default=15.0)
    args = ap.parse_args()

    def load(path: str) -> dict:
        text = open(path).read().strip()
        try:
            return json.loads(text)  # pretty-printed BENCH_FULL artifact
        except json.JSONDecodeError:
            return json.loads(text.splitlines()[-1])  # bench stdout tail

    base = load(args.base)
    scaled = load(args.scaled)
    bq, sq = base["queries"], scaled["queries"]

    rows = {}
    flagged = []
    for name, s_sec in sq.items():
        b_sec = bq.get(name, -1.0)
        ratio = round(s_sec / b_sec, 2) if (b_sec and b_sec > 0 and s_sec >= 0) else None
        # sub-0.3s base timings are dominated by fixed per-query overhead
        # (job scheduling, codegen); ratio flags only apply above that
        flag = bool(ratio and ratio > args.max_ratio and b_sec >= 0.3)
        rows[name] = {"base_sec": b_sec, "scaled_sec": s_sec, "ratio": ratio, "flag": flag}
        if flag:
            flagged.append(name)

    out = {
        "metric": "scale_smoke",
        "base_sf": base.get("sf"),
        "scaled_sf": scaled.get("sf"),
        "base_total_sec": base.get("value"),
        "scaled_total_sec": scaled.get("value"),
        "total_ratio": round(scaled["value"] / base["value"], 2),
        "max_ratio_allowed": args.max_ratio,
        "flagged": flagged,
        "queries": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"flagged": flagged, "total_ratio": out["total_ratio"]}))


if __name__ == "__main__":
    main()
