"""Deterministic scale-up of the driver testdata for local scale smokes.

Replicates every table at a source scale N times with a consistent key
offset per replica, preserving FK relationships (orders.o_custkey ->
customer, lineitem.l_orderkey -> orders, ...), group cardinalities per
key, and value distributions.  Text and embeddings are perturbed per
replica (deterministic suffix / epsilon on one component) so dedup and
ANN workloads see realistic near-duplicate structure instead of exact
K-cliques of copies, which would be an unrepresentative skew stress.

Dims region/nation are copied as-is (they are fixed-cardinality in
TPC-H).  Output goes under the repo (gitignored), never /root/testdata.

Usage: python tools/make_scale.py [--src /root/testdata/sf0.1] \
        [--out /root/repo/.scale/sf1] [--factor 10] [--skew]

--skew (r10 verdict task 5) plants a zipf-ish lines-per-order tail in
LINEITEM after replication — the uniform replicator keeps ~4
lines/order, so the quadratic fan-in regime that q21's
per-order-aggregate rewrite and skew_salted_sum's salting exist for
was never exercised locally.  Two deterministic hot tiers:

- super-hot: orderkeys with ``o_orderkey % 997 == 7``  (~0.1%) get
  their lines replicated x64;
- warm:      orderkeys with ``o_orderkey % 97  == 13`` (~1%, minus
  the super-hot overlap) get x8.

Replicated lines keep l_linenumber distinct (offset by a stride) and
perturb l_quantity's replica copy deterministically so salted-sum
buckets see distinct values.  Orders/customer/etc are unchanged — the
skew is purely fan-in on the join/agg key, which is the regime under
test.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from usda_food_data_pipeline_spark.session import get_spark
from usda_food_data_pipeline_spark.sources.tables import TABLES, load_table

# key columns that get the per-replica offset, per table; the SAME stride
# is used for a key wherever it appears so FKs stay consistent
KEY_COLS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# one stride per key FAMILY (shared by FK pairs), derived from the max of
# the primary side so offset ranges never collide between replicas
KEY_FAMILY: dict[str, tuple[str, str]] = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--skew", action="store_true",
                    help="plant a zipf-ish lines-per-order tail in lineitem")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    spark = get_spark("make-scale")
    os.makedirs(args.out, exist_ok=True)

    strides: dict[tuple[str, str], int] = {}

    def stride_for(col: str) -> int:
        fam = KEY_FAMILY[col]
        if fam not in strides:
            tbl, key = fam
            m = load_table(spark, args.src, tbl).agg(F.max(key)).collect()[0][0]
            strides[fam] = int(m) + 1
        return strides[fam]

    replicas = spark.range(args.factor).withColumnRenamed("id", "_r")

    for name in TABLES:
        src = load_table(spark, args.src, name)
        if name == "events":
            # write back raw micros timestamp; drop the derived ts_ns
            src = src.drop("ts_ns")
        keys = KEY_COLS[name]
        if not keys:
            src.write.mode("overwrite").parquet(f"{args.out}/{name}.parquet")
            continue
        df = src.crossJoin(F.broadcast(replicas))
        for k in keys:
            df = df.withColumn(k, (F.col(k) + F.col("_r") * F.lit(stride_for(k))).cast("long"))
        if name == "documents":
            # replicas become near-duplicates of the original, not copies
            df = df.withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" rep"), F.col("_r").cast("string"))
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if name == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(F.col("_r") == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.array(
                            (
                                F.element_at("embedding", 1)
                                + F.col("_r").cast("float") * F.lit(0.001)
                            ).cast("float")
                        ),
                        F.slice("embedding", 2, 100000),
                    )
                ),
            )
        df = df.drop("_r").select(*src.columns)
        if name == "lineitem" and args.skew:
            # zipf-ish planted fan-in: explode hot orderkeys' lines.
            # l_linenumber stays unique per (orderkey, partkey) via the
            # stride offset; quantity perturbs per copy so salted-sum
            # partials see distinct values.
            mult = (
                F.when(F.col("l_orderkey") % 997 == 7, F.lit(64))
                .when(F.col("l_orderkey") % 97 == 13, F.lit(8))
                .otherwise(F.lit(1))
            )
            ln_stride = 64
            df = (
                df.withColumn("_i", F.explode(F.sequence(F.lit(1), mult)))
                .withColumn(
                    "l_linenumber",
                    (F.col("l_linenumber") + (F.col("_i") - 1) * F.lit(ln_stride))
                    .cast("int"),
                )
                .withColumn(
                    "l_quantity",
                    F.col("l_quantity") + (F.col("_i") - 1).cast("double"),
                )
                .drop("_i")
                .select(*src.columns)
            )
        df.write.mode("overwrite").parquet(f"{args.out}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{args.out}/{name}.parquet').count()} rows")


if __name__ == "__main__":
    main()
