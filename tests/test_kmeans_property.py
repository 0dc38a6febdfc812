"""Randomized parity: kmeans_assign vs a direct Python Lloyd on the
same quantized integer lattice (same init, grid, rounding, tie rule)."""

import pytest
import random

from usda_food_data_pipeline_spark.operators.kmeans import (
    GRID,
    SCALE,
    SHIFT,
    kmeans_assign,
)


def _py_lloyd(vectors, k, n_iter):
    import math

    pts = {
        vid: [math.floor(v * SCALE) + SHIFT for v in vec]
        for vid, vec in vectors
    }
    dim = len(next(iter(pts.values())))
    seeds = sorted(pts)[:k]
    cents = [[pts[s][d] * GRID for d in range(dim)] for s in seeds]

    def assign():
        out = {}
        for vid, x in pts.items():
            best = None
            for ci, c in enumerate(cents):
                dd = sum((x[d] * GRID - c[d]) ** 2 for d in range(dim))
                key = dd * k + ci
                if best is None or key < best[0]:
                    best = (key, ci, dd)
            out[vid] = (best[1], best[2])
        return out

    for _ in range(n_iter):
        a = assign()
        sums = {}
        for vid, (ci, _) in a.items():
            s, n = sums.get(ci, ([0] * dim, 0))
            sums[ci] = ([s[d] + pts[vid][d] for d in range(dim)], n + 1)
        for ci, (s, n) in sums.items():
            cents[ci] = [(2 * s[d] * GRID + n) // (2 * n) for d in range(dim)]
    return assign()


@pytest.mark.slow
def test_randomized_kmeans_matches_python_lloyd(spark):
    for seed in (3, 17):
        rng = random.Random(seed)
        vectors = [
            (i, [round(rng.uniform(-0.6, 0.6), 4) for _ in range(8)])
            for i in range(60)
        ]
        df = spark.createDataFrame(vectors, ["vec_id", "embedding"])
        got = {
            r["vec_id"]: (r["cluster"], r["d2"])
            for r in kmeans_assign(df, k=4, n_iter=3).collect()
        }
        exp = _py_lloyd(vectors, k=4, n_iter=3)
        assert got == exp, f"seed {seed}"
