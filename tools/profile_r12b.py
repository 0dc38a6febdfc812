"""Round-12 continuation profiler: min-of-N noop-sink timings for a list
of registered queries in ONE SparkSession (the bench methodology), with
optional ``--jobs`` statusTracker job/task counts per query.

Usage:
    python tools/profile_r12b.py [--sf SFDIR] [--n N] [--jobs] q1 q2 ...

Prints one line per query: ``name  min_sec  [all runs]  [jobs/tasks]``.
Measurement tool only — never part of a query path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from usda_food_data_pipeline_spark import registry
from usda_food_data_pipeline_spark.session import get_spark

from bench import run_query, warmup


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = 3
    want_jobs = False
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--n":
            n = int(next(it))
        elif a == "--jobs":
            want_jobs = True
        else:
            names.append(a)
    spark = get_spark("profile_r12b")
    warmup(spark, sf_dir)
    qs = registry.queries()
    sc = spark.sparkContext
    for name in names:
        fn = qs[name]
        runs: list[float] = []
        jobs = tasks = 0
        for i in range(n):
            sc.setJobDescription(f"profile:{name}#{i}")
            tracker = sc.statusTracker()
            before = set(tracker.getJobIdsForGroup() or [])
            t0 = time.time()
            run_query(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
            if want_jobs and i == n - 1:
                after = tracker.getJobIdsForGroup() or []
                new = [j for j in after if j not in before]
                jobs = len(new)
                tasks = 0
                for j in new:
                    info = tracker.getJobInfo(j)
                    for s in info.stageIds if info else []:
                        si = tracker.getStageInfo(s)
                        if si:
                            tasks += si.numTasks
            spark.catalog.clearCache()
            registry.GUARD_STATS.pop(name, None)
        extra = f"  jobs={jobs} tasks={tasks}" if want_jobs else ""
        print(f"{name:32s} min={min(runs):7.3f}  runs={runs}{extra}", flush=True)


if __name__ == "__main__":
    main()
