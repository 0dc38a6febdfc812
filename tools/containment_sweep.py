"""Containment-join recall sweep at replication scale (r08 verdict
task 6 'done' criterion): plant contiguous-inclusion pairs whose
contained side is carved from the corpus's HOTTEST bigram runs — the
exact all-hot-prefix regime where the L1 cap suppressed every
collision before round 9 — run the full operator at the production
cap, and assert zero missed planted pairs plus honest guard counters.

Usage: python tools/containment_sweep.py [--sf-dir /root/repo/.scale/sf3]
        [--n-plant 20] [--out CONTAINMENT_SWEEP_sf3.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    GuardStats,
    containment_pairs_prefix,
)
from usda_food_data_pipeline_spark.session import get_spark


def hottest_spans(sf_dir: str, n_plant: int, span_toks: int = 24) -> list[tuple[int, str]]:
    """(container doc_id, contained span text) pairs whose EVERY bigram
    is over the cap — found with one DuckDB pass over the corpus."""
    con = duckdb.connect()
    pat = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(pat):
        pat = os.path.join(pat, "*.parquet")
    rows = con.execute(
        f"""
WITH tk AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t != '') AS toks
    FROM read_parquet('{pat}')
),
bg AS (
    SELECT doc_id, g AS pos, toks[g] || ' ' || toks[g+1] AS b
    FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks)-1, 0)+1)) AS g FROM tk)
),
-- doc frequency per bigram (matches the operator's df = distinct docs)
df AS (
    SELECT b, count(DISTINCT doc_id) AS df_n FROM bg GROUP BY b
),
runs AS (
    SELECT bg.doc_id, bg.pos,
           CASE WHEN df.df_n > {DEFAULT_MAX_BUCKET} THEN 1 ELSE 0 END AS hot
    FROM bg JOIN df USING (b)
),
-- longest all-hot run start per doc: count consecutive hot positions
marked AS (
    SELECT doc_id, pos, hot,
           pos - row_number() OVER (PARTITION BY doc_id, hot ORDER BY pos) AS grp
    FROM runs
),
spans AS (
    SELECT doc_id, min(pos) AS p0, count(*) AS runlen
    FROM marked WHERE hot = 1 GROUP BY doc_id, grp
)
SELECT s.doc_id, s.p0, s.runlen, tk.toks
FROM spans s JOIN tk ON tk.doc_id = s.doc_id
WHERE s.runlen >= {span_toks}
ORDER BY s.runlen DESC, s.doc_id
LIMIT {n_plant}
"""
    ).fetchall()
    out = []
    for doc_id, p0, _runlen, toks in rows:
        span = toks[p0 - 1 : p0 - 1 + span_toks + 1]  # pos is 1-based bigram start
        out.append((int(doc_id), " ".join(span)))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scale/sf3")
    ap.add_argument("--n-plant", type=int, default=20)
    ap.add_argument("--out", default="CONTAINMENT_SWEEP_sf3.json")
    args = ap.parse_args()

    plants = hottest_spans(args.sf_dir, args.n_plant)
    spark = get_spark("containment-sweep")
    from usda_food_data_pipeline_spark.sources.tables import load_table, spread

    docs = spread(load_table(spark, args.sf_dir, "documents"))
    base_max = docs.agg(F.max("doc_id")).collect()[0][0]
    planted_rows = [
        (int(base_max) + 1 + i, span, "planted", container_id)
        for i, (container_id, span) in enumerate(plants)
    ]
    planted = spark.createDataFrame(
        planted_rows, "doc_id bigint, text string, source string, container bigint"
    )
    corpus = docs.select("doc_id", "text").unionByName(
        planted.select("doc_id", "text")
    )

    obs = GuardStats()
    t0 = time.time()
    out = containment_pairs_prefix(
        corpus, "doc_id", "text", 3, 5, observation=obs
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    sec = round(time.time() - t0, 2)
    guards = obs.get

    want = {(r[0], r[3]) for r in planted_rows}
    missed = sorted(p for p in want if p not in pairs)
    result = {
        "sf_dir": args.sf_dir,
        "n_docs": int(base_max) + 1 + len(planted_rows),
        "n_planted": len(planted_rows),
        "n_planted_all_hot_spans": len(plants),
        "missed_planted": missed,
        "n_output_pairs": len(pairs),
        "sec": sec,
        "guards": guards,
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 1 if missed else 0


if __name__ == "__main__":
    sys.exit(main())
