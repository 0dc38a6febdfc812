"""Vocabulary-growth scale check (r05 verdict task 8).

The sf1/sf3 smokes replicate documents: near-dup clusters grow while the
vocabulary stays fixed — the regime where blocking buckets heat up. The
complementary axis is NEW content: K disjoint copies of the sf0.1
corpus with per-copy word remapping (``w -> w.vK``), so the vocabulary
grows linearly with the corpus, per-shingle document frequency is
UNCHANGED, and there are no cross-copy duplicates. On this axis the
content-blocked dedup operators must stay on the lossless cold path
(zero hot shingles, bucket occupancy flat, pairs exactly K x base) with
~linear work.

Usage: python tools/vocab_growth.py [--copies 3,30] [--out VOCAB_GROWTH.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1/documents.parquet"


def build_corpus(spark, k: int, out_dir: str) -> str:
    """K copies of the base docs, each with a disjoint remapped
    vocabulary and offset doc ids."""
    if os.path.isdir(out_dir):
        return out_dir
    base = spark.read.parquet(BASE)
    stride = base.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(k):
        remapped = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda t: F.concat(t, F.lit(f".v{i}")),
            ),
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                remapped.alias("text"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out_dir)
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", default="3,30")
    ap.add_argument("--out", default=os.path.join(REPO, "VOCAB_GROWTH.json"))
    ap.add_argument("--keep-corpora", action="store_true")
    args = ap.parse_args()

    spark = get_spark("vocab-growth")
    from usda_food_data_pipeline_spark.operators.dedup import (
        GuardStats,
        jaccard_pairs_prefix,
        minhash_lsh_pairs,
    )

    results = {}
    corpora = []
    for k in [int(x) for x in args.copies.split(",")]:
        out_dir = os.path.join(REPO, ".scale", f"vocab{k}")
        build_corpus(spark, k, out_dir)
        corpora.append(out_dir)
        docs = spark.read.parquet(out_dir)
        entry = {"docs": docs.count()}

        stats = GuardStats()
        t0 = time.time()
        pairs = jaccard_pairs_prefix(
            docs, "doc_id", "text", 1, 5, 2, observation=stats
        ).count()
        entry["jaccard"] = {
            "pairs": pairs, "sec": round(time.time() - t0, 1), **stats.get,
        }
        spark.catalog.clearCache()

        stats2 = GuardStats()
        t0 = time.time()
        mpairs = minhash_lsh_pairs(
            docs, "doc_id", "text", observation=stats2
        ).count()
        entry["minhash"] = {
            "pairs": mpairs, "sec": round(time.time() - t0, 1), **stats2.get,
        }
        spark.catalog.clearCache()

        results[f"x{k}"] = entry
        print(json.dumps({f"x{k}": entry}), flush=True)

    out = {
        "axis": "vocabulary growth (disjoint per-copy word remap of sf0.1 docs)",
        "protocol": "same-session, single-shot per size",
        "expect": "zero hot shingles / zero drops / flat max bucket; pairs = K x 260 (jaccard), K x 255 (minhash)",
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    if not args.keep_corpora:
        for c in corpora:
            shutil.rmtree(c, ignore_errors=True)


if __name__ == "__main__":
    main()
