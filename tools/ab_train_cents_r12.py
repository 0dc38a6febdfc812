"""Round-12 focused A/B: the _train_cents TRAINING LOOP only, old
(pandas_udf argmin + JVM element_at aggregate per round) vs new
(mapInPandas partials via _train_books_joint), same un-persisted input
both sides, alternating order, min-of-N.  Separates the trainer-shape
question from kmeans_assign's added persist.

Usage: python tools/ab_train_cents_r12.py [sf_dir] [n_rounds] [k] [iters]
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
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
IT = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def main() -> None:
    spark = get_spark("ab-train-cents-r12")
    emb = load_table(spark, SF_DIR, "embeddings")
    pts = new._quantized(emb, "vec_id", "embedding")
    spark.range(100_000).selectExpr("id AS k").mapInPandas(
        lambda it: it, "k long"
    ).count()

    # parity (also warms both code paths)
    co, do_ = old._train_cents(pts, "vec_id", K, IT)
    cn, dn = new._train_cents(pts, "vec_id", K, IT)
    assert (co, do_) == (cn, dn), "trainer outputs differ"

    times = {"old": [], "new": []}
    for i in range(N):
        order = (("new", new), ("old", old)) if i % 2 == 0 else (
            ("old", old), ("new", new)
        )
        for label, mod in order:
            t0 = time.time()
            mod._train_cents(pts, "vec_id", K, IT)
            times[label].append(round(time.time() - t0, 3))
    print(
        "AB_RESULT "
        + json.dumps(
            {
                "sf_dir": SF_DIR,
                "k": K,
                "n_iter": IT,
                "old_min": min(times["old"]),
                "new_min": min(times["new"]),
                "ratio": round(min(times["new"]) / min(times["old"]), 3),
                "old_all": times["old"],
                "new_all": times["new"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
