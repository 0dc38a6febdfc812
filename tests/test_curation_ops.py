"""Hand-value tests for the corpus-curation wave (registry_curation):
graded n-gram contamination, Bloom decontamination (including a planted
false positive accounting check), feature hashing, tokenizer fertility,
and the rolling exact median.

The registry entries themselves are exact-oracle-gated by
test_oracle_gate.py; these tests pin the SEMANTICS on tiny hand-checked
inputs where the expected values are computable by eye.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.operators.dedup import md5_int, tokenize, word_shingles
from usda_food_data_pipeline_spark.registry_curation import (
    _BLOOM_M,
    _BLOOM_SEEDS,
    _FH_DIMS,
    _FH_SEED_DIM,
    _FH_SEED_SIGN,
)


# ---------------------------------------------------------------------------
# ngram_overlap_score semantics
# ---------------------------------------------------------------------------

def test_ngram_overlap_ppm_is_floor_exact(spark):
    # doc with 3 distinct trigram shingles, 1 contaminated -> 333333 ppm
    # (floor of 1/3), never 333334 (banker's/half-up rounding would drift)
    df = spark.createDataFrame(
        [(1, "a b c d e")], ["doc_id", "text"]
    ).select(
        "doc_id",
        F.size(word_shingles(tokenize(F.col("text")), 3)).alias("n_sh"),
    )
    assert df.collect()[0].n_sh == 3
    assert (1 * 1000000) // 3 == 333333


def test_ngram_overlap_score_counts(spark):
    # Inline replica of the registry chain on a planted corpus:
    # bench doc (id 0, id%7==0) = "x y z w"; corpus doc 1 shares the
    # shingle "x y z" (1 of its 2 shingles -> 500000 ppm); doc 2 shares
    # nothing.
    docs = spark.createDataFrame(
        [(0, "x y z w"), (1, "x y z q"), (2, "p q r s t")],
        ["doc_id", "text"],
    )
    bench = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(F.explode(word_shingles(tokenize(F.col("text")), 3)).alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .select("doc_id", word_shingles(tokenize(F.col("text")), 3).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
        .filter(F.col("n_sh") > 0)
    )
    out = (
        corpus.select("doc_id", "n_sh", F.explode("sh").alias("s"))
        .join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(F.max("n_sh").alias("n_shingles"), F.count("hit").alias("n_contaminated"))
        .select("doc_id", F.expr("(n_contaminated * 1000000) div n_shingles").alias("ppm"))
    )
    got = {r.doc_id: r.ppm for r in out.collect()}
    assert got == {1: 500000, 2: 0}


# ---------------------------------------------------------------------------
# bloom_decontaminate: membership + FP accounting
# ---------------------------------------------------------------------------

def test_bloom_positions_deterministic(spark):
    # the k positions of a fixed shingle are stable across sessions —
    # the property the exact oracle depends on
    df = spark.createDataFrame([("alpha beta gamma",)], ["s"])
    rows = df.select(
        *[(md5_int(F.col("s"), seed) % _BLOOM_M).alias(f"p{i}") for i, seed in enumerate(_BLOOM_SEEDS)]
    ).collect()[0]
    again = df.select(
        *[(md5_int(F.col("s"), seed) % _BLOOM_M).alias(f"p{i}") for i, seed in enumerate(_BLOOM_SEEDS)]
    ).collect()[0]
    assert tuple(rows) == tuple(again)
    assert all(0 <= p < _BLOOM_M for p in rows)


def test_bloom_true_member_always_hits(spark, sf_dir):
    # no false NEGATIVES ever: every true hit is also a bloom hit
    from usda_food_data_pipeline_spark.registry_curation import (
        q_bloom_decontaminate,
    )

    out = q_bloom_decontaminate(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_bloom_hits >= r.n_true_hits  # FP adds, never subtracts


@pytest.mark.slow
def test_bloom_vs_exact_decontaminate_superset(spark, sf_dir):
    # docs flagged by the exact screen (>=2 true shared shingles) are a
    # subset of bloom-flagged docs (bloom can only add hits)
    from usda_food_data_pipeline_spark.registry_curation import (
        q_bloom_decontaminate,
    )

    bloom_docs = {r.doc_id for r in q_bloom_decontaminate(spark, sf_dir).collect()}
    exact_docs = {
        r.doc_id
        for r in q_bloom_decontaminate(spark, sf_dir)
        .filter(F.col("n_true_hits") >= 2)
        .collect()
    }
    assert exact_docs <= bloom_docs


# ---------------------------------------------------------------------------
# feature_hashing
# ---------------------------------------------------------------------------

def test_feature_hashing_repeated_token_accumulates(spark):
    # "tok tok tok" -> one dim with |value| == 3 (sign consistent per token)
    from usda_food_data_pipeline_spark.registry_curation import q_feature_hashing  # noqa: F401

    ex = spark.createDataFrame([(1, "tok tok tok")], ["doc_id", "text"]).select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("t")
    )
    out = (
        ex.select(
            "doc_id",
            (md5_int(F.col("t"), _FH_SEED_DIM) % _FH_DIMS).alias("dim"),
            (F.lit(1) - F.lit(2) * (md5_int(F.col("t"), _FH_SEED_SIGN) % 2)).alias("sgn"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("sgn").alias("v"))
        .collect()
    )
    assert len(out) == 1
    assert abs(out[0].v) == 3


def test_feature_hashing_sign_cancellation(spark):
    # two tokens in the same dim with opposite signs cancel to 0 and the
    # row is dropped (HAVING <> 0) — search a small token pool for a
    # colliding opposite-sign pair so the test exercises cancellation
    pool = [f"w{i}" for i in range(300)]
    df = spark.createDataFrame([(t,) for t in pool], ["t"])
    rows = df.select(
        "t",
        (md5_int(F.col("t"), _FH_SEED_DIM) % _FH_DIMS).alias("dim"),
        (F.lit(1) - F.lit(2) * (md5_int(F.col("t"), _FH_SEED_SIGN) % 2)).alias("sgn"),
    ).collect()
    by_dim: dict[int, dict[int, str]] = {}
    pair = None
    for r in rows:
        d = by_dim.setdefault(r.dim, {})
        if -r.sgn in d:
            pair = (d[-r.sgn], r.t)
            break
        d[r.sgn] = r.t
    assert pair is not None, "300 tokens into 256 dims must collide"
    a, b = pair
    out = (
        spark.createDataFrame([(1, f"{a} {b}")], ["doc_id", "text"])
        .select("doc_id", F.explode(tokenize(F.col("text"))).alias("t"))
        .select(
            "doc_id",
            (md5_int(F.col("t"), _FH_SEED_DIM) % _FH_DIMS).alias("dim"),
            (F.lit(1) - F.lit(2) * (md5_int(F.col("t"), _FH_SEED_SIGN) % 2)).alias("sgn"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("sgn").alias("v"))
        .filter(F.col("v") != 0)
        .collect()
    )
    assert out == []


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------

def test_fertility_hand_values(spark):
    # tokens: "internationalization" (20 chars -> ceil(20/4)=5 subwords),
    # "a" (1 -> 1), "spark" (5 -> 2): fertility = 8/3 tokens
    from usda_food_data_pipeline_spark.registry_curation import (
        q_tokenizer_fertility,  # noqa: F401 (registry import side effect)
    )

    toks = ["internationalization", "a", "spark"]
    n_sub = sum((len(t) + 3) // 4 for t in toks)
    assert n_sub == 8
    assert (n_sub * 1000000) // len(toks) == 2666666  # floor, not round


# ---------------------------------------------------------------------------
# rolling_median
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "vals,expect_last",
    [
        ([1.0, 100.0, 2.0, 3.0, 2.0], 200),  # odd frame of 5: median 2.0 -> 200c
        ([5.0, 1.0], 300),  # even frame of 2: floor((100+500)/2) = 300c
        ([7.0], 700),  # singleton frame
    ],
)
def test_rolling_median_frames(spark, vals, expect_last):
    from datetime import datetime, timezone

    from usda_food_data_pipeline_spark.registry_curation import q_rolling_median  # noqa: F401

    rows = [
        (i, datetime(2026, 1, 1, 0, 0, i, tzinfo=timezone.utc), 1, "e", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    from pyspark.sql import Window

    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, Window.currentRow)
    win = F.array_sort(F.collect_list(vc).over(w))
    n = F.size(win)
    med = (
        F.when(n % 2 == 1, F.element_at(win, ((n + 1) / 2).cast("int")))
        .otherwise(
            F.floor(
                (F.element_at(win, (n / 2).cast("int")) + F.element_at(win, (n / 2 + 1).cast("int"))) / 2
            )
        )
        .cast("bigint")
    )
    out = df.select("event_id", med.alias("m")).collect()
    last = max(out, key=lambda r: r.event_id)
    assert last.m == expect_last


def test_rolling_median_robust_to_outlier(spark):
    # the detector property rolling_anomaly's mean lacks: one 1000x
    # outlier inside the frame leaves the median baseline unchanged
    clean = sorted([10.0, 11.0, 12.0, 13.0, 14.0])
    with_outlier = sorted([10.0, 11.0, 12.0, 13.0, 14000.0])
    assert clean[2] == 12.0 and with_outlier[2] == 12.0


# ---------------------------------------------------------------------------
# split_leakage_eval
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_split_leakage_pairs_consistent_with_components(spark, sf_dir):
    # every reported (split_a, split_b) row is ordered, and doc counts
    # are bounded by 2 * n_pairs (each pair contributes at most 2 docs)
    from usda_food_data_pipeline_spark.registry_curation import q_split_leakage_eval

    rows = q_split_leakage_eval(spark, sf_dir).collect()
    assert rows, "fixture corpus has planted near-dups; expect leakage rows"
    for r in rows:
        assert r.split_a <= r.split_b
        assert 2 <= r.n_docs <= 2 * r.n_pairs


def test_split_leakage_matches_manual_composition(spark, sf_dir):
    # composing the two attested primitives by hand reproduces the
    # registry row set exactly
    from pyspark.sql import functions as F

    from usda_food_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from usda_food_data_pipeline_spark.operators.topk import split_assign
    from usda_food_data_pipeline_spark.registry_curation import q_split_leakage_eval
    from usda_food_data_pipeline_spark.registry_text import _MH_THRESHOLD, _SPLIT_SEED
    from usda_food_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", jaccard_threshold=_MH_THRESHOLD
    ).select("id_a", "id_b")
    splits = {
        r.doc_id: r.split
        for r in split_assign(
            docs, "doc_id", {"train": 8, "val": 1, "test": 1}, seed=_SPLIT_SEED
        ).collect()
    }
    manual: dict[tuple[str, str], int] = {}
    for r in pairs.collect():
        key = tuple(sorted((splits[r.id_a], splits[r.id_b])))
        manual[key] = manual.get(key, 0) + 1
    got = {
        (r.split_a, r.split_b): r.n_pairs
        for r in q_split_leakage_eval(spark, sf_dir).collect()
    }
    assert got == manual


# ---------------------------------------------------------------------------
# cluster_purity
# ---------------------------------------------------------------------------

def test_cluster_purity_bounds_and_totals(spark, sf_dir):
    from usda_food_data_pipeline_spark.registry_curation import q_cluster_purity
    from usda_food_data_pipeline_spark.sources.tables import load_table

    rows = q_cluster_purity(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_total  # every vector assigned once
    for r in rows:
        assert 1 <= r.n_majority <= r.n_vecs
        assert r.purity_ppm == (r.n_majority * 1000000) // r.n_vecs
        # purity can never be below 1/n_labels of the cluster
        assert r.purity_ppm >= 1000000 // 10 // 2  # >= half the uniform share


def test_cluster_purity_tie_breaks_to_min_label(spark):
    # a 2-2 tie between labels 3 and 7 must report majority_label 3
    counts = {(0, 7): 2, (0, 3): 2}
    n_maj = max(counts.values())
    winner = min(lbl for (_, lbl), n in counts.items() if n == n_maj)
    assert winner == 3


# ---------------------------------------------------------------------------
# quality_percentile_norm
# ---------------------------------------------------------------------------

def test_percentile_norm_bounds_and_ties(spark):
    from pyspark.sql import functions as F

    from usda_food_data_pipeline_spark.registry_curation import (
        q_quality_percentile_norm,  # noqa: F401
    )

    # planted source with a tie: ranks 1,1,3 of n=3 -> ppm 0, 0, 1000000
    df = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 10), (3, "s", 20), (4, "solo", 5)],
        ["doc_id", "source", "n_chars"],
    )
    df.createOrReplaceTempView("_pn_docs")
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    wr = w.orderBy("n_chars")
    out = df.select(
        "doc_id",
        F.rank().over(wr).alias("rk"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    ).select(
        "doc_id",
        F.when(F.col("cnt") > 1, F.expr("((rk - 1) * 1000000) div (cnt - 1)"))
        .otherwise(F.lit(0))
        .alias("ppm"),
    )
    got = {r.doc_id: r.ppm for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1000000, 4: 0}


# ---------------------------------------------------------------------------
# cluster_outliers
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_cluster_outliers_are_farthest(spark, sf_dir):
    from usda_food_data_pipeline_spark.operators.kmeans import kmeans_assign
    from usda_food_data_pipeline_spark.registry_curation import q_cluster_outliers
    from usda_food_data_pipeline_spark.registry_vector import _KM_ITER, _KM_K
    from usda_food_data_pipeline_spark.sources.tables import load_table

    out = q_cluster_outliers(spark, sf_dir).collect()
    assign = kmeans_assign(
        load_table(spark, sf_dir, "embeddings"), k=_KM_K, n_iter=_KM_ITER
    ).collect()
    by_cluster: dict[int, list] = {}
    for r in assign:
        by_cluster.setdefault(r.cluster, []).append((r.d2, r.vec_id))
    for r in out:
        ranked = sorted(by_cluster[r.cluster], key=lambda t: (-t[0], t[1]))
        assert (r.d2, r.vec_id) == ranked[r.rk - 1]


# ---------------------------------------------------------------------------
# vector_winsor_card
# ---------------------------------------------------------------------------

def test_winsor_bounds_ordered_and_counts_bounded(spark, sf_dir):
    from usda_food_data_pipeline_spark.registry_curation import q_vector_winsor_card

    rows = q_vector_winsor_card(spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.lo_q <= r.hi_q
        # rank-percentile construction bounds the clip counts:
        # n_below < ceil(5% n), n_above <= n - ceil(95% n)
        assert r.n_below < (500 * 5 + 99) // 100
        assert r.n_above <= 500 - (500 * 95 + 99) // 100


def test_winsor_rank_semantics_hand_case(spark):
    # 10 values 1..10: lo rank ceil(0.05*10)=1 -> value 1;
    # hi rank ceil(0.95*10)=10 -> value 10; nothing clipped
    n = 10
    lo_rank = (n * 5 + 99) // 100
    hi_rank = (n * 95 + 99) // 100
    assert (lo_rank, hi_rank) == (1, 10)
    # 100 values: ranks 5 and 95 -> 4 below, 5 above
    n = 100
    assert ((n * 5 + 99) // 100, (n * 95 + 99) // 100) == (5, 95)


# ---------------------------------------------------------------------------
# padding_truncation_card
# ---------------------------------------------------------------------------

def test_padding_truncation_identities(spark, sf_dir):
    from usda_food_data_pipeline_spark.registry_curation import (
        q_padding_truncation_card,
    )

    rows = {r.max_len: r for r in q_padding_truncation_card(spark, sf_dir).collect()}
    assert set(rows) == {128, 256, 512}
    n_docs = {r.n_docs for r in rows.values()}
    n_tokens = {r.n_tokens for r in rows.values()}
    assert len(n_docs) == 1 and len(n_tokens) == 1  # arms see the same corpus
    for L, r in rows.items():
        # conservation: kept + lost == total; padded <= n_docs * max_len
        assert 0 <= r.tokens_lost <= r.n_tokens
        assert 0 <= r.tokens_padded <= r.n_docs * L
        assert r.trunc_waste_ppm == (r.tokens_lost * 1000000) // r.n_tokens
        assert r.pad_waste_ppm == (r.tokens_padded * 1000000) // (r.n_docs * L)
    # monotonicity: larger max_len never truncates more, never pads less
    assert rows[128].tokens_lost >= rows[256].tokens_lost >= rows[512].tokens_lost
    assert rows[128].tokens_padded <= rows[256].tokens_padded <= rows[512].tokens_padded


# ---------------------------------------------------------------------------
# Plan pins: the scale-critical physical shapes of the curation wave
# ---------------------------------------------------------------------------

def test_contamination_joins_are_broadcast(spark, sf_dir):
    # the benchmark side must never become a shuffle join: corpus text
    # stays map-side in both contamination screens
    from usda_food_data_pipeline_spark.registry_curation import (
        q_bloom_decontaminate,
        q_ngram_overlap_score,
    )

    for q in (q_ngram_overlap_score, q_bloom_decontaminate):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


def test_cluster_outliers_window_group_limit(spark, sf_dir):
    # rk <= N over the per-cluster window must compile to
    # WindowGroupLimit so tasks forward at most N rows per cluster
    from usda_food_data_pipeline_spark.registry_curation import q_cluster_outliers

    plan = (
        q_cluster_outliers(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_split_leakage_single_lsh_build(spark, sf_dir):
    # the split attaches as a pure md5-bucket EXPRESSION on the pair ids
    # (a (doc_id, split) join would ship a corpus-sized table at scale),
    # and the verified pair stream is persisted so its three consumers
    # (pair count + two union arms) read the cache instead of rebuilding
    # the LSH pipeline: the final plan has exactly ONE join (the 6-row
    # aggregate merge) over in-memory scans of the pair table
    import re

    from usda_food_data_pipeline_spark.registry_curation import q_split_leakage_eval

    plan = (
        q_split_leakage_eval(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "InMemoryTableScan" in plan
    # the printed tree embeds the cache-BUILD plan under each
    # InMemoryTableScan node; the live toplevel (everything above the
    # first cache scan) must contain only the single aggregate-merge join
    toplevel = plan.split("InMemoryTableScan")[0]
    assert len(re.findall(r"\b\w*Join\b", toplevel)) == 1
