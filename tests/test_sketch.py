"""Count-Min Sketch properties (functions/sketch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.functions.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_heavy_hitters,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


def test_cms_never_undercounts_and_ranks_true_heavy_hitter_first(spark):
    texts = [
        "spark " * 50 + "rare one two three",
        "spark spark join join join shuffle",
        "alpha beta gamma delta spark",
    ]
    out = cms_heavy_hitters(_docs(spark, texts), k=10).collect()
    assert out, "non-empty corpus must produce heavy hitters"
    # one-sided error: the estimate never undercounts, row-wise
    assert all(r["overcount"] >= 0 for r in out)
    assert all(r["est_n"] == r["true_n"] + r["overcount"] for r in out)
    # 'spark' dominates (53 occurrences) and CMS min-estimates are
    # monotone in true counts up to +eps*N, so it must rank first
    assert out[0]["token"] == "spark"
    assert out[0]["true_n"] == 53


def test_cms_table_is_fixed_width(spark):
    texts = [f"tok{i} tok{i % 7} filler words here" for i in range(200)]
    ctr = cms_build(_docs(spark, texts))
    rows = ctr.collect()
    assert len(rows) <= CMS_DEPTH * CMS_WIDTH
    assert {int(r["r"]) for r in rows} <= set(range(CMS_DEPTH))
    assert all(0 <= int(r["b"]) < CMS_WIDTH for r in rows)
    # mass conservation per row hash: every row's counters sum to N
    n_tokens = 5 * 200
    by_r = {}
    for r in rows:
        by_r[int(r["r"])] = by_r.get(int(r["r"]), 0) + int(r["c"])
    assert all(v == n_tokens for v in by_r.values())


def test_cms_is_mergeable_across_shards(spark):
    """The sketch of a union equals the counter-wise SUM of per-shard
    sketches — the property that lets shards build independently at
    100 TB and merge in one tiny aggregate."""
    a = [f"w{i % 11} common text body" for i in range(60)]
    b = [f"w{i % 5} other common body" for i in range(40)]
    whole = cms_build(_docs(spark, a + b))
    merged = (
        cms_build(_docs(spark, a))
        .unionByName(cms_build(_docs(spark, b)))
        .groupBy("r", "b")
        .agg(F.sum("c").alias("c"))
    )
    got = {(r["r"], r["b"]): int(r["c"]) for r in whole.collect()}
    exp = {(r["r"], r["b"]): int(r["c"]) for r in merged.collect()}
    assert got == exp


def test_ann_recall_eval_bounds_and_exact_degenerate(spark):
    """Recall@k properties: 0 <= recall <= 1 always, and with ONE
    centroid the IVF probe covers the whole corpus, so recall must be
    exactly 1.0 for every query."""
    import random

    from usda_food_data_pipeline_spark.operators.similarity import ann_recall_eval

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = emb.filter("vec_id < 5")

    one_cent = emb.filter("vec_id = 0").selectExpr(
        "vec_id AS centroid_id", "embedding"
    )
    out = ann_recall_eval(emb, one_cent, queries, k=10).collect()
    assert len(out) == 5
    assert all(r["recall"] == 1.0 and r["n_hits"] == 10 for r in out)

    four_cents = emb.filter("vec_id < 4").selectExpr(
        "vec_id AS centroid_id", "embedding"
    )
    out4 = ann_recall_eval(emb, four_cents, queries, k=10).collect()
    assert all(0.0 <= r["recall"] <= 1.0 for r in out4)
    assert all(r["n_hits"] <= min(r["n_exact"], r["n_ivf"]) for r in out4)


def test_label_propagation_separates_two_cliques(spark):
    """Two 4-cliques bridged by one edge: after 3 deterministic rounds
    every node carries its clique's minimum id as label, and the
    communities stay distinct (the bridge does not merge them —
    neighbor-mode voting outweighs the single cross edge). Verified
    against a pure-Python mirror of the synchronous update."""
    from usda_food_data_pipeline_spark.operators.graph import label_propagation

    cliq1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cliq2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = cliq1 + cliq2 + [(3, 10)]  # bridge
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["n"]: r["label"] for r in label_propagation(df, rounds=3).collect()}

    # python mirror: synchronous neighbor-mode, ties to smallest label
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, ns in adj.items():
            cnt = {}
            for m in ns:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            new[n] = min(cnt, key=lambda x: (-cnt[x], x))
        lab = new
    assert got == lab
    assert len({got[n] for n in range(4)}) == 1
    assert len({got[n] for n in range(10, 14)}) == 1
    assert got[0] != got[13]  # two communities survive the bridge


def test_hll_registers_match_reference_python(spark):
    """Register table = pure function of the token set: recompute with
    an independent Python md5 implementation."""
    import hashlib

    from usda_food_data_pipeline_spark.functions.sketch import (
        HLL_M,
        HLL_SEED,
        hll_registers,
    )

    rows = [(i, f"tok{i % 37} tok{(i * 7) % 23} filler{i % 5}") for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["j"]: r["mj"] for r in hll_registers(docs, "text").collect()}

    want: dict[int, int] = {}
    for _, text in rows:
        for w in text.split():
            h = int(hashlib.md5(f"s{HLL_SEED}:{w}".encode()).hexdigest()[:12], 16)
            j, wq = h % HLL_M, h // HLL_M
            r = 41 if wq == 0 else 41 - wq.bit_length()
            want[j] = max(want.get(j, 0), r)
    assert got == want


def test_hll_estimate_tracks_true_distinct(spark):
    """With vocab ≫ m the raw estimator engages; relative error should
    sit well inside the 3σ band (σ ≈ 1.04/√256 = 6.5%)."""
    from usda_food_data_pipeline_spark.functions.sketch import hll_distinct

    n_vocab = 5000
    rows = [
        (i, " ".join(f"w{(i * 97 + k) % n_vocab}" for k in range(40)))
        for i in range(400)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    row = hll_distinct(docs, "text").collect()[0]
    true_d = row["true_distinct"]
    assert true_d == len({f"w{(i * 97 + k) % n_vocab}" for i in range(400) for k in range(40)})
    assert abs(row["est"] - true_d) / true_d < 0.20
    assert row["rel_err"] == pytest.approx((row["est"] - true_d) / true_d, abs=1e-6)


def test_hll_merge_is_elementwise_max(spark):
    """Shard registers merge by elementwise max == whole-corpus
    registers (the mergeability contract)."""
    from usda_food_data_pipeline_spark.functions.sketch import hll_registers

    rows = [(i, f"alpha{i % 50} beta{(i * 3) % 80}") for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    whole = {r["j"]: r["mj"] for r in hll_registers(docs, "text").collect()}
    a = {r["j"]: r["mj"] for r in hll_registers(docs.filter("doc_id % 2 = 0"), "text").collect()}
    b = {r["j"]: r["mj"] for r in hll_registers(docs.filter("doc_id % 2 = 1"), "text").collect()}
    merged: dict[int, int] = {}
    for d in (a, b):
        for j, m in d.items():
            merged[j] = max(merged.get(j, 0), m)
    assert merged == whole


def test_kcore_peel_keeps_clique_drops_chain(spark):
    """A 4-clique survives k=2 peeling; a pendant chain hanging off it
    peels away one node per round (bounded rounds = approximation from
    above, exact at convergence)."""
    from usda_food_data_pipeline_spark.operators.graph import kcore_peel

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, ["src", "dst"])
    # 3 rounds: 12 (deg1) goes in r1, 11 in r2, 10 in r3 -> clique only
    got = {r["n"]: r["deg"] for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # 1 round: only the tail node peels; induced degrees reflect it
    got1 = {r["n"]: r["deg"] for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert set(got1) == {0, 1, 2, 3, 10, 11}
    assert got1[11] == 1  # superset-from-above: not yet converged


def test_kcore_peel_releases_checkpoint_generations(spark):
    """r08 ADVICE (medium): unpersist() is a no-op on localCheckpoint
    blocks, so the peel loop must retire superseded survivor-set
    generations through CheckpointJanitor (the pagerank discipline) —
    only the final result's checkpoint generation may stay alive."""
    from usda_food_data_pipeline_spark.operators.dedup import (
        persistent_rdd_ids,
        release_rdd_blocks,
    )
    from usda_food_data_pipeline_spark.operators.graph import kcore_peel

    spark.catalog.clearCache()
    before = persistent_rdd_ids(spark)
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, ["src", "dst"])
    out = kcore_peel(edges, k=2, rounds=5)
    out.count()
    live = persistent_rdd_ids(spark) - before
    # 5 rounds + final = 6 checkpoints created; all but the final one
    # (1-2 RDD ids) must have been released by the janitor
    assert len(live) <= 2, f"stranded checkpoint generations: {live}"
    release_rdd_blocks(spark, live)
