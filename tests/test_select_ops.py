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


# ---------------------------------------------------------------------------
# Interleave schedule semantics
# ---------------------------------------------------------------------------

def test_interleave_round_robin_order(spark, tmp_path):
    # sources a={1,3}, b={2}: positions = (rn1: a.1, b.2), (rn2: a.3)
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import q_interleave_schedule

    d = tmp_path / "il"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["x"] * 3,
            "lang": ["en"] * 3,
            "source": ["a", "b", "a"],
            "n_chars": [1] * 3,
        }
    ).to_parquet(d / "documents.parquet")
    rows = q_interleave_schedule(spark, str(d)).orderBy("pos").collect()
    assert [(r.pos, r.doc_id, r.source, r.rn) for r in rows] == [
        (1, 1, "a", 1),
        (2, 2, "b", 1),
        (3, 3, "a", 2),
    ]


# ---------------------------------------------------------------------------
# Last-touch attribution semantics
# ---------------------------------------------------------------------------

def test_attribution_carries_touch_past_conversion_runs(spark, tmp_path):
    # stream: purchase(1) [no touch], click(2), purchase(3), purchase(4)
    # -> 1 unattributed; 3 and 4 BOTH attribute to click 2
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import (
        q_attribution_last_touch,
    )

    d = tmp_path / "attr"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:00", "2026-01-01 00:00:10",
                 "2026-01-01 00:00:20", "2026-01-01 00:00:30"]
            ),
            "user_id": [1] * 4,
            "event_type": ["purchase", "click", "purchase", "purchase"],
            "value": [1.0] * 4,
            "props": [""] * 4,
        }
    ).to_parquet(d / "events.parquet")
    rows = {r.event_id: r for r in q_attribution_last_touch(spark, str(d)).collect()}
    assert set(rows) == {1, 3, 4}
    assert rows[1].touch_event_id is None and rows[1].gap_us is None
    assert rows[3].touch_event_id == 2 and rows[3].touch_type == "click"
    assert rows[3].gap_us == 10_000_000
    assert rows[4].touch_event_id == 2 and rows[4].gap_us == 20_000_000


# ---------------------------------------------------------------------------
# Inverted index semantics
# ---------------------------------------------------------------------------

def test_inverted_index_df_cf_postings(spark, tmp_path):
    # doc 1: "a a b", doc 2: "b c" -> a:(df1,cf2,[1]) b:(df2,cf2,[1,2]) c:(df1,cf1,[2])
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import (
        q_inverted_index_postings,
    )

    d = tmp_path / "inv"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a a b", "b c"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [5, 3],
        }
    ).to_parquet(d / "documents.parquet")
    rows = {r.token: r for r in q_inverted_index_postings(spark, str(d)).collect()}
    assert (rows["a"].df, rows["a"].cf, rows["a"].postings) == (1, 2, "1")
    assert (rows["b"].df, rows["b"].cf, rows["b"].postings) == (2, 2, "1,2")
    assert (rows["c"].df, rows["c"].cf, rows["c"].postings) == (1, 1, "2")


# ---------------------------------------------------------------------------
# Stratified ES sampling semantics
# ---------------------------------------------------------------------------

def test_stratified_sample_quota_and_global_consistency(spark, sf_dir):
    # every language fills min(quota, group size); within a group the
    # selection is exactly the group's smallest ES keys, which the
    # GLOBAL sampler with the same seed would also rank first
    from usda_food_data_pipeline_spark.registry_select import (
        _WSG_N,
        q_weighted_sample_stratified,
    )
    from usda_food_data_pipeline_spark.sources.tables import load_table

    out = q_weighted_sample_stratified(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert got.get(lang, 0) == min(_WSG_N, n)


def test_stratified_sample_scratch_collision_fails_fast(spark):
    import pytest

    from usda_food_data_pipeline_spark.operators.topk import (
        weighted_sample_es_grouped,
    )

    df = spark.createDataFrame([(1, "en", 5, 9)], ["doc_id", "lang", "n_chars", "_es_key"])
    with pytest.raises(ValueError, match="_es_key"):
        weighted_sample_es_grouped(
            df, 1, 1, "doc_id", F.col("n_chars"), ["lang"]
        )


# ---------------------------------------------------------------------------
# Recency decay semantics
# ---------------------------------------------------------------------------

def test_recency_decay_halves_per_week(spark, tmp_path):
    # anchor = max date (day 14). ages 0, 7, 14 days -> shifts 0, 1, 2:
    # 800 + 400 + 200 cents (values all 8.00)
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import q_recency_decay_score

    d = tmp_path / "dec"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(["2026-01-01", "2026-01-08", "2026-01-15"]),
            "user_id": [1] * 3,
            "event_type": ["view"] * 3,
            "value": [8.0] * 3,
            "props": [""] * 3,
        }
    ).to_parquet(d / "events.parquet")
    rows = q_recency_decay_score(spark, str(d)).collect()
    assert len(rows) == 1
    assert rows[0].n_events == 3
    assert rows[0].decayed_cents == 800 + 400 + 200


def test_stratified_sample_window_group_limit_plan(spark, sf_dir):
    # per-group quota must compile to WindowGroupLimit (not a full sort
    # of every stratum through the window)
    from usda_food_data_pipeline_spark.registry_select import (
        q_weighted_sample_stratified,
    )

    plan = (
        q_weighted_sample_stratified(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# Market-basket semantics
# ---------------------------------------------------------------------------

def test_market_basket_support_conf_lift(spark, tmp_path):
    # 4 orders: {1,2} x3, {1} x1 -> pair (1,2): supp_ab=3, supp_1=4,
    # supp_2=3, n_orders=4; conf(2|1)=750000, lift=(3*4)/(4*3)=1000000
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import q_market_basket_lift

    d = tmp_path / "mb"
    d.mkdir()
    rows = []
    lk = 0
    for ok, parts in [(1, [1, 2]), (2, [1, 2]), (3, [1, 2]), (4, [1])]:
        for pk in parts:
            lk += 1
            rows.append((ok, pk, lk))
    # minimal columns only — the query reads (l_orderkey, l_partkey), and
    # a timestamp-free fixture keeps this test independent of the
    # session-global nanosAsLong conf another test may have set
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey", "l_linenumber"])
    df.to_parquet(d / "lineitem.parquet")
    out = q_market_basket_lift(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pk_a, r.pk_b, r.supp_ab, r.supp_a, r.supp_b) == (1, 2, 3, 4, 3)
    assert r.conf_ppm == (3 * 1000000) // 4 == 750000
    assert r.lift_ppm == (3 * 4 * 1000000) // (4 * 3) == 1000000


# ---------------------------------------------------------------------------
# Novelty curve semantics
# ---------------------------------------------------------------------------

def test_novelty_counts_first_occurrence_batches(spark, tmp_path):
    # batch 0 (docs < 100): doc 1 "a b c d" -> {abc,bcd} new=2
    # batch 1 (doc 150): "a b c e" -> bce? shingles {abc,bce}: abc seen -> new=1
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import q_ngram_novelty_curve

    d = tmp_path / "nov"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 150],
            "text": ["a b c d", "a b c e"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [7, 7],
        }
    ).to_parquet(d / "documents.parquet")
    rows = {r.batch: r for r in q_ngram_novelty_curve(spark, str(d)).collect()}
    assert rows[0].n_new == 2 and rows[0].cum_distinct == 2
    assert rows[1].n_new == 1 and rows[1].cum_distinct == 3


# ---------------------------------------------------------------------------
# Activity entropy semantics
# ---------------------------------------------------------------------------

def test_activity_entropy_monoculture_is_zero(spark, tmp_path):
    # user 1: 4x 'view' -> H = ln(4) - (4*ln4)/4 = 0 exactly
    # user 2: 2x 'view' + 2x 'click' -> H = ln(4) - ln(2) = ln 2 > 0
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import (
        q_user_activity_entropy,
    )

    d = tmp_path / "ent"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": list(range(1, 9)),
            "ts": pd.to_datetime(["2026-01-01"] * 8),
            "user_id": [1, 1, 1, 1, 2, 2, 2, 2],
            "event_type": ["view"] * 4 + ["view", "view", "click", "click"],
            "value": [1.0] * 8,
            "props": [""] * 8,
        }
    ).to_parquet(d / "events.parquet")
    rows = {r.user_id: r for r in q_user_activity_entropy(spark, str(d)).collect()}
    assert rows[1].entropy_nanos == 0
    # ln 2 in nanos on the portable grid
    from usda_food_data_pipeline_spark.functions.portable_ln import LN2, py_grid_nanos
    assert abs(rows[2].entropy_nanos - py_grid_nanos(LN2)) <= 2


# ---------------------------------------------------------------------------
# Churn label semantics
# ---------------------------------------------------------------------------

def test_churn_label_cutoff_inclusive_of_window(spark, tmp_path):
    # max date 2026-02-01, mid = 2026-01-18.
    # user 1: event on 01-01 only -> churned (before>0, after=0)
    # user 2: events 01-01 and 02-01 -> retained
    # user 3: event 01-18 only (>= mid) -> new user, NOT churned (before=0)
    import pandas as pd

    from usda_food_data_pipeline_spark.registry_select import q_churn_labels

    d = tmp_path / "ch"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(["2026-01-01", "2026-01-01", "2026-02-01", "2026-01-18"]),
            "user_id": [1, 2, 2, 3],
            "event_type": ["view"] * 4,
            "value": [1.0] * 4,
            "props": [""] * 4,
        }
    ).to_parquet(d / "events.parquet")
    rows = {r.user_id: r for r in q_churn_labels(spark, str(d)).collect()}
    assert (rows[1].n_before, rows[1].n_after, rows[1].churned) == (1, 0, 1)
    assert (rows[2].n_before, rows[2].n_after, rows[2].churned) == (1, 1, 0)
    assert (rows[3].n_before, rows[3].n_after, rows[3].churned) == (0, 1, 0)
