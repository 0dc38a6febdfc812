"""Skew-mitigation utilities for hot-key joins and aggregations.

At 100 TB a single hot key (one UPC with millions of records, one
ubiquitous shingle) serializes a whole join task. Two tools:

1. AQE skew-join splitting — on by default in the session factory
   (``spark.sql.adaptive.skewJoin.enabled``); handles sort-merge joins
   transparently.
2. Explicit salting (this module) — for aggregations and for joins
   where one side can be replicated: spread the hot key over N salt
   buckets, aggregate partially per bucket, then merge. Two shuffles of
   1/N-sized groups instead of one shuffle with a straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    sum_cast: str = "decimal(30,6)",
) -> DataFrame:
    """Two-stage aggregation: partial sums per (key, salt), then final
    merge per key. The salt is content-derived but spread by an
    arbitrary distinct column pattern — here a deterministic hash of the
    whole row's value, which is enough to split a hot key's rows.
    Result: one column ``sum_<value_col>`` per key, bit-identical to the
    unsalted decimal sum (decimal addition is associative)."""
    # Salt must come from a ROW-unique source: hashing the value would
    # put a hot key whose rows share one value (duplicate records, 0.0
    # defaults) into a single bucket — exactly the case salting exists
    # for. pmod, not %: Spark's % takes the dividend's sign.
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    ).alias("_salt")
    partial = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(F.col(value_col).cast(sum_cast)).alias("_psum"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("_psum").cast("double").alias(f"sum_{value_col}"))
    )


def replicate_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Salted join for a skewed big side against a small side: salt the
    big side's key, explode the small side across all salt values, join
    on (key, salt). Equivalent rows to the plain join, but the hot key's
    rows land in n_salts tasks instead of one. (With a genuinely small
    side, plain ``broadcast()`` is simpler — this shape is for when the
    small side exceeds the broadcast threshold but replication by
    n_salts is still affordable.)"""
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(exploded, [key, "_salt"]).drop("_salt")
