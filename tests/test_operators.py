"""Unit tests for operator semantics on tiny in-memory frames —
reference-behavior fixtures per FIXTURES.md §A (duplicate keys, dirty
values, nulls, mixed case)."""

from __future__ import annotations

from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.functions.cleaning import (
    resolve_thresholds,
    row_null_count,
    safe_cast_round,
    threshold_nullout,
)
from usda_food_data_pipeline_spark.operators.dedup import dedup_latest, exact_dedup
from usda_food_data_pipeline_spark.operators.topk import seeded_sample


def test_dedup_latest_keeps_max_per_key(spark):
    # branded_food analog: duplicate gtin_upc with distinct fdc_id
    df = spark.createDataFrame(
        [("u1", 1), ("u1", 3), ("u1", 2), ("u2", 5)], ["upc", "rec_id"]
    )
    out = {r["upc"]: r["rec_id"] for r in dedup_latest(df, ["upc"], "rec_id").collect()}
    assert out == {"u1": 3, "u2": 5}


def test_dedup_latest_keep_min(spark):
    df = spark.createDataFrame([("u1", 1), ("u1", 3)], ["upc", "rec_id"])
    out = dedup_latest(df, ["upc"], "rec_id", keep="min").collect()
    assert out[0]["rec_id"] == 1


def test_safe_cast_round_coerces_dirty_values(spark):
    # reference: pd.to_numeric(errors='coerce').round(2) — :76
    df = spark.createDataFrame(
        [("12.345",), ("not-a-number",), (None,), ("2.005",)], ["serving_size"]
    )
    out = [r[0] for r in df.select(safe_cast_round("serving_size", 2)).collect()]
    assert out[0] == 12.34 or out[0] == 12.35  # bround half-even of 12.345
    assert out[1] is None and out[2] is None


def test_threshold_nullout(spark):
    df = spark.createDataFrame([(1.0, 10.0), (100.0, 3.0)], ["a", "b"])
    out = threshold_nullout(df, {"a": 50.0, "b": 5.0}).collect()
    assert (out[0]["a"], out[0]["b"]) == (1.0, None)
    assert (out[1]["a"], out[1]["b"]) == (None, 3.0)


def test_resolve_thresholds_name_then_unit_fallback():
    # reference :14-23,:119-120 — lookup by full name, fallback by (UNIT)
    cols = ["PROTEIN (G)", "ENERGY (KCAL)", "WEIRD (G)"]
    by_name = {"PROTEIN (G)": 100.0}
    by_unit = {"G": 50.0, "KCAL": 900.0}
    assert resolve_thresholds(cols, by_name, by_unit) == {
        "PROTEIN (G)": 100.0,
        "ENERGY (KCAL)": 900.0,
        "WEIRD (G)": 50.0,
    }


def test_row_null_count(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (None, None, None)], "a int, b int, c string"
    )
    out = [r[0] for r in df.select(row_null_count(["a", "b", "c"])).collect()]
    assert out == [1, 3]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    out = {r["canonical_id"]: r["n_copies"] for r in exact_dedup(df, "text", "doc_id").collect()}
    assert out == {1: 2, 3: 1}


def test_seeded_sample_deterministic_across_partitionings(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = [r["k"] for r in seeded_sample(df, 50, 42, "k").collect()]
    b = [r["k"] for r in seeded_sample(df.repartition(13), 50, 42, "k").collect()]
    assert a == b and len(a) == 50
