"""Hand-value tests for the selection/layout wave (registry_select):
Pareto frontier dominance semantics, greedy max-coverage tie-breaks,
compaction bin boundaries, class-balance weights, trailing EMA folds,
MAD outlier degeneracy, and the Jaccard kNN graph's symmetry/rank
contract.

The registry entries themselves are exact-oracle-gated by
test_oracle_gate.py; these tests pin the SEMANTICS on tiny inputs
where the expected values are computable by eye, plus the scale-
critical physical plan shapes.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Pareto frontier semantics
# ---------------------------------------------------------------------------

def _frontier(spark, pts):
    """Inline replica of the registry's level-table skyline on
    (id, m1, m2) rows — maximizing both metrics."""
    df = spark.createDataFrame(pts, ["doc_id", "m1", "m2"])
    lv = df.groupBy("m1").agg(F.max("m2").alias("grp_max"))
    w = Window.orderBy(F.desc("m1")).rowsBetween(Window.unboundedPreceding, -1)
    cm = lv.select("m1", "grp_max", F.max("grp_max").over(w).alias("better_max"))
    out = (
        df.join(cm, "m1")
        .filter(
            (F.col("better_max").isNull() | (F.col("better_max") < F.col("m2")))
            & (F.col("grp_max") == F.col("m2"))
        )
        .select("doc_id")
    )
    return sorted(r.doc_id for r in out.collect())


def test_pareto_dominated_point_dropped(spark):
    # (1,1) is dominated by (2,2); (2,2) and (1,3) are incomparable
    assert _frontier(spark, [(1, 2, 2), (2, 1, 1), (3, 1, 3)]) == [1, 3]


def test_pareto_ties_on_both_axes_keep_both(spark):
    # identical points dominate nothing and are dominated by nothing
    assert _frontier(spark, [(1, 5, 5), (2, 5, 5)]) == [1, 2]


def test_pareto_same_m1_higher_m2_dominates(spark):
    # same m1 level: only the level max survives (strict m2 dominance)
    assert _frontier(spark, [(1, 5, 5), (2, 5, 7)]) == [2]


def test_pareto_equal_m1_greater_m2_vs_strictly_greater_m1(spark):
    # (10, 3) beats (9, 3) (same m2, greater m1) but not (9, 4)
    assert _frontier(spark, [(1, 10, 3), (2, 9, 3), (3, 9, 4)]) == [1, 3]


# ---------------------------------------------------------------------------
# Greedy max-coverage semantics
# ---------------------------------------------------------------------------

def test_coverage_greedy_marginal_gain_and_tiebreak(spark, monkeypatch, tmp_path):
    # Universe by doc (as token shingles of 3-word windows is awkward to
    # hand-plant, drive the registry fn over a tiny planted parquet):
    # doc 1: "a b c d e f"   -> shingles {abc,bcd,cde,def}      (4)
    # doc 2: "a b c d e x"   -> {abc,bcd,cde,dex}               (4, ties doc 1 -> doc 1 wins round 1)
    # doc 3: "p q r s"       -> {pqr,qrs}                       (2)
    # Round 1: doc 1 (gain 4). Round 2: doc 2's uncovered = {dex} (1) vs
    # doc 3's {pqr,qrs} (2) -> doc 3. Round 3: doc 2 (gain 1).
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import (
        q_coverage_greedy_select,
    )

    d = tmp_path / "sel"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d e f", "a b c d e x", "p q r s"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [11, 11, 7],
        }
    ).to_parquet(d / "documents.parquet")
    rows = q_coverage_greedy_select(spark, str(d)).orderBy("sel_round").collect()
    got = [(r.sel_round, r.doc_id, r.marginal_gain, r.covered_total) for r in rows]
    assert got == [(1, 1, 4, 4), (2, 3, 2, 6), (3, 2, 1, 7)]


# ---------------------------------------------------------------------------
# Compaction plan semantics
# ---------------------------------------------------------------------------

def test_compaction_bins_cut_on_cumulative_before(spark, tmp_path):
    # target 4096; docs of 3000 chars each in one source:
    # cum_before = 0, 3000, 6000, 9000 -> file_id = 0, 0, 1, 2
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import q_compaction_plan

    d = tmp_path / "cp"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["x"] * 4,
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [3000] * 4,
        }
    ).to_parquet(d / "documents.parquet")
    rows = q_compaction_plan(spark, str(d)).orderBy("file_id").collect()
    got = [(r.file_id, r.n_docs, r.total_chars, r.min_doc_id, r.max_doc_id) for r in rows]
    assert got == [(0, 2, 6000, 1, 2), (1, 1, 3000, 3, 3), (2, 1, 3000, 4, 4)]


# ---------------------------------------------------------------------------
# Class-balance weights semantics
# ---------------------------------------------------------------------------

def test_class_balance_inverse_frequency(spark, tmp_path):
    # 3 en + 1 de: weights = total/(k*n) = 4/(2*3), 4/(2*1) in floor ppm
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import (
        q_class_balance_weights,
    )

    d = tmp_path / "cb"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["x"] * 4,
            "lang": ["en", "en", "en", "de"],
            "source": ["s"] * 4,
            "n_chars": [1] * 4,
        }
    ).to_parquet(d / "documents.parquet")
    rows = {r.lang: r for r in q_class_balance_weights(spark, str(d)).collect()}
    assert rows["en"].n_docs == 3 and rows["de"].n_docs == 1
    assert rows["en"].share_ppm == (3 * 1000000) // 4 == 750000
    assert rows["en"].weight_ppm == (4 * 1000000) // (2 * 3) == 666666
    assert rows["de"].weight_ppm == (4 * 1000000) // (2 * 1) == 2000000


# ---------------------------------------------------------------------------
# Trailing EMA fold semantics
# ---------------------------------------------------------------------------

def test_ema_fold_matches_hand_iteration(spark):
    # frame [100, 200, 400]: e = 100 -> (100+200)//2 = 150 -> (150+400)//2 = 275
    win = F.array(F.lit(100).cast("bigint"), F.lit(200).cast("bigint"), F.lit(400).cast("bigint"))
    ema = F.aggregate(
        F.slice(win, F.lit(2), F.size(win) - 1),
        F.element_at(win, 1),
        lambda acc, v: F.floor((acc + v) / 2).cast("bigint"),
    )
    assert spark.range(1).select(ema.alias("e")).collect()[0].e == 275


def test_ema_single_element_frame_is_identity(spark):
    win = F.array(F.lit(7).cast("bigint"))
    ema = F.aggregate(
        F.slice(win, F.lit(2), F.size(win) - 1),
        F.element_at(win, 1),
        lambda acc, v: F.floor((acc + v) / 2).cast("bigint"),
    )
    assert spark.range(1).select(ema.alias("e")).collect()[0].e == 7


def test_ema_registry_first_row_per_user_is_seed(spark, sf_dir):
    # each user's first event (frame of 1) must equal its own cents value
    from usda_food_data_pipeline_spark.registry_select import q_ema_trailing
    from usda_food_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
        )
    )
    got = q_ema_trailing(spark, sf_dir).join(first, "event_id")
    assert got.filter(F.col("ema_cents") != F.col("vc")).count() == 0


# ---------------------------------------------------------------------------
# MAD outlier semantics
# ---------------------------------------------------------------------------

def _mad_rows(spark, tmp_path, vals):
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import q_mad_outliers

    d = tmp_path / "mad"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": list(range(1, len(vals) + 1)),
            "ts": pd.to_datetime(
                [f"2026-01-01 00:00:{i:02d}" for i in range(len(vals))]
            ),
            "user_id": [1] * len(vals),
            "event_type": ["e"] * len(vals),
            "value": vals,
            "props": [""] * len(vals),
        }
    ).to_parquet(d / "events.parquet")
    return q_mad_outliers(spark, str(d)).collect()


def test_mad_flags_planted_outlier(spark, tmp_path):
    # values 10,11,12,13,100: median=12.00, devs(cents)=[200,100,0,100,8800],
    # MAD = middle of sorted devs = 100 -> only dev 8800 > 300 flagged
    rows = _mad_rows(spark, tmp_path, [10.0, 11.0, 12.0, 13.0, 100.0])
    assert len(rows) == 1
    r = rows[0]
    assert r.event_id == 5 and r.value_cents == 10000
    assert r.median_cents == 1200 and r.mad_cents == 100


def test_mad_zero_mad_degenerates_to_any_deviation(spark, tmp_path):
    # 4 identical + 1 different: MAD = 0, so the single deviant flags
    rows = _mad_rows(spark, tmp_path, [5.0, 5.0, 5.0, 5.0, 6.0])
    assert [(r.event_id, r.mad_cents) for r in rows] == [(5, 0)]


# ---------------------------------------------------------------------------
# Jaccard kNN graph contract
# ---------------------------------------------------------------------------

def test_jaccard_knn_symmetric_edges_and_rank_bound(spark, sf_dir):
    from usda_food_data_pipeline_spark.registry_select import (
        _KNN_K,
        q_jaccard_knn_graph,
    )

    rows = q_jaccard_knn_graph(spark, sf_dir).collect()
    edges = {(r.doc_id, r.nb_id): r.jaccard for r in rows}
    assert rows, "fixture contains planted near-dups; graph must be non-empty"
    for r in rows:
        assert 1 <= r.rnk <= _KNN_K
        assert r.doc_id != r.nb_id
        # the underlying pair stream is symmetric; the REVERSE edge exists
        # unless it fell off the neighbor's own top-k
        rev = edges.get((r.nb_id, r.doc_id))
        assert rev is None or rev == r.jaccard
    # per-doc ranks are dense from 1
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.rnk)
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


# ---------------------------------------------------------------------------
# Plan pins: the scale-critical physical shapes of the selection wave
# ---------------------------------------------------------------------------

def test_pareto_level_join_is_broadcast(spark, sf_dir):
    # the level table (distinct m1 values) must broadcast: corpus rows
    # stream map-side, never shuffle on the metric value
    from usda_food_data_pipeline_spark.registry_select import q_pareto_frontier

    plan = (
        q_pareto_frontier(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_jaccard_knn_topk_is_window_group_limit(spark, sf_dir):
    # rnk <= K must compile to WindowGroupLimit so each task forwards at
    # most K rows per doc into the final window sort
    from usda_food_data_pipeline_spark.registry_select import q_jaccard_knn_graph

    plan = (
        q_jaccard_knn_graph(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
