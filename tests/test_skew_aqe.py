"""AQE skew-join plan assertions (r10 verdict task 5).

The engine's session factory enables
``spark.sql.adaptive.skewJoin.enabled``; at cluster scale the default
byte thresholds (256 MB partition, factor 5) govern. These tests pin
the MECHANISM on a planted hot key with test-scale thresholds, plus
the two planning caveats the probe uncovered — both matter when
reasoning about 100 TB plans:

1. skew detection is BYTE-based post-compression: a hot partition of
   highly compressible rows can sit under the threshold even when its
   row count is 600x the median (the test uses md5 strings to defeat
   compression — production text/embedding payloads behave like this);
2. a downstream aggregation ON THE JOIN KEY blocks the split: AQE will
   not break the join's hash clustering if a consumer requires it
   (ENSURE_REQUIREMENTS), so a hot-key join feeding a same-key groupBy
   gets NO skew mitigation — that shape needs explicit salting
   (operators/skew.py) instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "8",
}


@pytest.fixture()
def skew_confs(spark):
    old = {}
    for k, v in _SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _hot_join(spark, agg_col: str):
    # one key with 600k incompressible rows, 999 cold keys with ~400 each
    big = spark.range(1_000_000).select(
        F.when(F.col("id") < 600_000, F.lit(0))
        .otherwise((F.col("id") % 999) + 1)
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    small = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("w")
    )
    return (
        big.join(small, "k").groupBy(agg_col).agg(F.count(F.lit(1)).alias("n"))
    )


def test_aqe_splits_skewed_smj(skew_confs):
    spark = skew_confs
    # downstream agg on the SMALL side's column: reshuffles anyway, so
    # AQE is free to split the skewed join partition
    j = _hot_join(spark, "w")
    assert len(j.collect()) == 1000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan  # AQEShuffleRead ... skewed


def test_same_key_agg_blocks_skew_split(skew_confs):
    spark = skew_confs
    # downstream agg ON the join key: AQE preserves the join's hash
    # clustering and refuses the split — the caveat that makes explicit
    # salting (operators/skew.py) the right tool for this shape
    j = _hot_join(spark, "k")
    assert len(j.collect()) == 1000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan
