"""Lloyd k-means semantics on hand-built vectors."""

import pytest
from usda_food_data_pipeline_spark.operators.kmeans import (
    GRID,
    SCALE,
    SHIFT,
    kmeans_assign,
)


def test_kmeans_separates_two_blobs(spark):
    # two tight blobs far apart; seeds are the 2 lowest ids — one in
    # each blob, so one round already converges
    rows = [
        (1, [0.10, 0.10]),
        (2, [0.90, 0.90]),
        (3, [0.12, 0.08]),
        (4, [0.88, 0.92]),
        (5, [0.11, 0.11]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in kmeans_assign(df, k=2, n_iter=2).collect()}
    assert {out[1]["cluster"], out[3]["cluster"], out[5]["cluster"]} == {0}
    assert {out[2]["cluster"], out[4]["cluster"]} == {1}
    # d2 is the exact squared grid distance to the blob's final centroid
    # centroid 1 = grid-rounded mean of quantized (2, 4)
    q = lambda x: int(x * SCALE) + SHIFT  # floor for these exact values
    c1 = [
        (2 * (q(0.90) + q(0.88)) * GRID + 2) // 4,
        (2 * (q(0.90) + q(0.92)) * GRID + 2) // 4,
    ]
    exp = sum((q(v) * GRID - c) ** 2 for v, c in zip([0.88, 0.92], c1))
    assert out[4]["d2"] == exp


def test_kmeans_empty_cluster_keeps_seed(spark):
    # both seeds sit in the same blob; every point assigns to the
    # nearer seed, cluster 1 may empty out — the run must not crash and
    # every point must still be assigned to a valid cluster
    rows = [(i, [0.5 + i * 1e-6, 0.5]) for i in range(1, 7)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kmeans_assign(df, k=2, n_iter=3).collect()
    assert len(out) == 6
    assert all(r["cluster"] in (0, 1) for r in out)
    assert all(r["d2"] >= 0 for r in out)


def test_kmeans_derives_width_from_vectors(spark):
    # ADVICE r06: width comes from the seed vectors, not a dim
    # parameter — a 3-wide embedding must cluster on all 3 coordinates
    # (under the old dim=64 default this truncated/crashed)
    rows = [
        (1, [0.1, 0.1, 0.1]),
        (2, [0.9, 0.9, 0.9]),
        (3, [0.1, 0.1, 0.12]),
        (4, [0.9, 0.9, 0.88]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, k=2, n_iter=2).collect()}
    assert out[1] == out[3] and out[2] == out[4] and out[1] != out[2]


@pytest.mark.slow
def test_cluster_balanced_sample_plan_and_invariants(spark):
    """WindowGroupLimit must appear (the rk<=cap filter runs as a
    partial per-partition top-cap, bounding the exchange by the
    parameter), and the kept-set must be partitioning-invariant."""
    from usda_food_data_pipeline_spark import registry

    q = registry.queries()["cluster_balanced_sample"]
    df = q(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r["cluster"], []).append(r["rk"])
    for cl, rks in per_cluster.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), cl
        assert len(rks) <= 12
