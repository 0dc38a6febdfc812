"""Round-12 same-session A/B: kmeans family old (r11 HEAD) vs new
(mapInPandas-partials _train_cents + persisted point tables).

Protocol (bench-noise, AB_NOTES.json): ONE SparkSession, alternating
old/new runs, min-of-N per side, value parity asserted by collecting
both sides sorted.  Old code is the pre-change git blob loaded as
usda_food_data_pipeline_spark.operators._kmeans_old_r12 (written by the
caller via `git show`).

Usage: python tools/ab_kmeans_r12.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from usda_food_data_pipeline_spark.operators import kmeans as new
from usda_food_data_pipeline_spark.session import get_spark
from usda_food_data_pipeline_spark.sources.tables import load_table


def _load_old_kmeans():
    """Materialize the pre-r12 kmeans module from git (commit 8f21228,
    the last tree before the r12 kmeans changes) and import it under
    the package namespace so its relative imports resolve.  Written to
    a gitignored temp name; never shipped in the package."""
    import subprocess
    import importlib

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "usda_food_data_pipeline_spark", "operators", "_kmeans_ab_old_tmp.py",
    )
    blob = subprocess.run(
        ["git", "show", "8f21228:usda_food_data_pipeline_spark/operators/kmeans.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    with open(path, "w") as f:
        f.write(blob)
    return importlib.import_module(
        "usda_food_data_pipeline_spark.operators._kmeans_ab_old_tmp"
    )


old = _load_old_kmeans()

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("ab-kmeans-r12")
    emb = load_table(spark, SF_DIR, "embeddings")
    # warm the Python worker pool + codegen like bench.warmup does
    spark.range(100_000).selectExpr("id AS k").mapInPandas(
        lambda it: it, "k long"
    ).count()

    cases = {
        "kmeans_assign": (
            lambda m: m.kmeans_assign(emb, k=8, n_iter=3),
            ["vec_id", "cluster", "d2"],
        ),
        "pq_quantize": (
            lambda m: m.pq_quantize(emb, m=4, k=16, n_iter=2),
            ["vec_id", "code_0", "code_1", "code_2", "code_3", "d2"],
        ),
        "pq_adc_topk": (
            lambda m: m.pq_adc_topk(emb, n_queries=16, top_k=10, m=4, k=16, n_iter=2),
            ["query_id", "neighbor_id", "adc_d2", "rank"],
        ),
    }
    out = {}
    for name, (build, cols) in cases.items():
        if ONLY and name not in ONLY:
            continue
        # value parity first (also warms both paths)
        a = sorted(map(tuple, build(old).select(*cols).collect()))
        spark.catalog.clearCache()
        b = sorted(map(tuple, build(new).select(*cols).collect()))
        spark.catalog.clearCache()
        assert a == b, f"{name}: old/new outputs differ"
        times = {"old": [], "new": []}
        for i in range(N):
            # alternate which side goes first so neither always runs on
            # the warmer session state
            order = (("new", new), ("old", old)) if i % 2 == 0 else (
                ("old", old), ("new", new)
            )
            for label, mod in order:
                t0 = time.time()
                noop(build(mod))
                times[label].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        o, n = min(times["old"]), min(times["new"])
        out[name] = {
            "sf_dir": SF_DIR,
            "old_min": o,
            "new_min": n,
            "ratio": round(n / o, 3),
            "old_all": times["old"],
            "new_all": times["new"],
            "parity_rows": len(a),
        }
        print(json.dumps({name: out[name]}))
    print("AB_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
