"""SparkSession factory.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
configs are cluster-safe: AQE re-plans joins/partitions at runtime, UTC
session timezone keeps timestamp semantics portable, and Arrow is enabled
for the (rare) pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "usda-food-data-pipeline-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``spark.sql.shuffle.partitions`` defaults to the local core count —
    the 200 default over-parallelizes small local runs; on a real cluster
    AQE coalescing makes the static number mostly irrelevant.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # 32 concurrent task threads doing compressed spill reads sit in
        # JNI critical sections; G1's GCLocker then starves the other
        # threads' 1 MB read-buffer allocations (observed: "Retried
        # waiting for GCLocker too often" -> spurious task OOM under an
        # undersized heap, multi-second allocation stalls otherwise).
        # More retries is strictly safer than failing the task.
        #
        # GC regime (r12 opt, measured): this process is a BATCH driver
        # — throughput matters, pause latency does not. Interleaved
        # fresh-session A/B of a 10-query medium subset at sf0.1
        # (3 sessions per GC, alternating): ParallelGC totals
        # 43.8/52.6/72.4s vs G1 59.3/59.7/62.0s; per-query min-of-3
        # ratios 0.67-1.01, geomean 0.83 (AB_NOTES round12_opt_gc_ab).
        # Parameterised so a latency-sensitive deployment (or a G1
        # re-measure) can flip it without code: SPARK_GRAFT_GC=g1
        # keeps the JVM default.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100"
            + (
                " -XX:+UseParallelGC"
                if os.environ.get("SPARK_GRAFT_GC", "parallel") == "parallel"
                else ""
            ),
        )
        .config("spark.ui.enabled", "false")
        # 256 MB: executors here (and the 100 TB design point) carry
        # 100+ GiB of memory, so a quarter-GB build side is cheap; under
        # AQE the threshold is re-checked against RUNTIME sizes, so a
        # table that is genuinely large at production scale still plans
        # as a shuffle join — raising this only converts joins whose
        # build side MEASURES small. Measured: the sf3 jaccard verify
        # joins (150k-doc shingle-array table, ~105 MB) drop from
        # shuffling 46M candidate rows twice to two broadcast lookups,
        # 165s -> 118s for the whole query.
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        # ObjectHashAggregate (collect_list/collect_set/percentile paths)
        # falls back to sort-based aggregation after only 128 distinct keys
        # by default — every high-cardinality array agg pays an external
        # sort it doesn't need. 128k keys of small aggregation buffers fit
        # comfortably per task; the sort fallback still protects the
        # genuinely huge-group case beyond that. Measured 25% off
        # array_agg_quantities at sf1 (6M rows, 1.5M groups).
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", str(128 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally-created session.

    The driver harness passes its own SparkSession to ``entry``/``queries``;
    only session-TZ matters for oracle parity (timestamps are compared
    against a UTC-naive DuckDB), so pin it here.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def clear_engine_caches(spark: SparkSession) -> None:
    """Release DataFrames persisted inside operators (MinHash signature
    tables, component label generations, flagship's dedup spine).

    Those persists are load-bearing within a single query execution but
    cannot be unpersisted by the operator itself (the result is lazy).
    Long-lived sessions that run many engine queries should call this
    between logical units — bench.py and tools/check_correctness.py do.
    """
    spark.catalog.clearCache()
