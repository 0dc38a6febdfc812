"""Round-12 GC regime A/B (r11 ledger item 3 / r11 verdict task 3c):
G1 (JVM default) vs ParallelGC for the local[32] single-JVM shape, as
interleaved FRESH-SESSION runs of a fixed medium query set.

Each child process builds the engine session (same confs as
session.get_spark) with the GC chosen by argv, runs the subset once
(noop sink, bench methodology), prints one JSON line.  The parent
alternates G1/Parallel N times each and reports per-GC totals.

Usage: python tools/ab_gc_r12.py            # parent, 3 sessions each
       python tools/ab_gc_r12.py child g1|parallel   # one session
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "ivf_adc_topk",
    "adc_recall_eval",
    "pagerank_parts",
    "doc_repetition",
    "nb_calibration",
    "dedup_clusters",
    "triangle_count",
    "kcore_nodes",
    "boilerplate_scrub",
    "tpch_q1",
]
SF_DIR = "/root/testdata/sf0.1"


def child(gc: str) -> None:
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    gc_flag = {"g1": "", "parallel": " -XX:+UseParallelGC"}[gc]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab-gc-{gc}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100"
            + gc_flag,
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            str(128 * 1024),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    from usda_food_data_pipeline_spark import registry

    bench.warmup(spark, SF_DIR)
    qs = registry.queries()
    out = {}
    for name in SUBSET:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    print("CHILD " + json.dumps({"gc": gc, "total": round(sum(out.values()), 3), "queries": out}))
    spark.stop()


def parent(n: int = 3) -> None:
    runs: dict[str, list[dict]] = {"g1": [], "parallel": []}
    for i in range(n):
        for gc in ("g1", "parallel") if i % 2 == 0 else ("parallel", "g1"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "child", gc],
                capture_output=True,
                text=True,
                timeout=1200,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("CHILD ")]
            if not line:
                print(f"child {gc} failed:", p.stderr[-500:], file=sys.stderr)
                continue
            rec = json.loads(line[0][6:])
            runs[gc].append(rec)
            print(f"session {i} {gc}: {rec['total']}s")
    summary = {
        gc: {
            "totals": [r["total"] for r in rs],
            "min": min(r["total"] for r in rs) if rs else None,
        }
        for gc, rs in runs.items()
    }
    # per-query min across same-GC sessions
    for gc, rs in runs.items():
        per = {}
        for r in rs:
            for q, s in r["queries"].items():
                per[q] = min(per.get(q, 1e9), s)
        summary[gc]["per_query_min"] = per
    print("GC_AB_RESULT " + json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2])
    else:
        parent(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
