"""rollup()/cube() DataFrame APIs vs the consolidated grouping_sets query.

Round 2 merged the rollup_agg/cube_agg/grouping_sets registry entries into
one driver slot (registry_ext.q_grouping_sets). These tests pin the
DataFrame APIs to subsets of that query's result so the API surface stays
attested: cube == all four grouping sets, rollup == the sets where
grouping(linestatus) >= grouping(returnflag).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.registry_ext import q_grouping_sets


def _agg(grouped):
    return grouped.agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
        "g_flag", "g_status", "n_rows",
    )


def _key(r):
    return (r["return_flag"], r["line_status"], r["g_flag"], r["g_status"])


def test_cube_matches_grouping_sets(spark, sf_dir):
    from usda_food_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cube = {_key(r): r["n_rows"] for r in _agg(li.cube("l_returnflag", "l_linestatus")).collect()}
    gs = {
        _key(r): r["n_rows"]
        for r in q_grouping_sets(spark, sf_dir).select(
            "return_flag", "line_status", "g_flag", "g_status", "n_rows"
        ).collect()
    }
    assert cube == gs


def test_rollup_is_grouping_sets_subset(spark, sf_dir):
    from usda_food_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rollup = {_key(r): r["n_rows"] for r in _agg(li.rollup("l_returnflag", "l_linestatus")).collect()}
    gs = {
        _key(r): r["n_rows"]
        for r in q_grouping_sets(spark, sf_dir).select(
            "return_flag", "line_status", "g_flag", "g_status", "n_rows"
        ).collect()
    }
    # rollup sets: (flag,status), (flag), () — i.e. g_status >= g_flag
    expected = {k: v for k, v in gs.items() if k[3] >= k[2]}
    assert rollup == expected
