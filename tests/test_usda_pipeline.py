"""Golden tests for the faithful USDA pipeline on miniature USDA-shaped
fixtures (FIXTURES.md §A: duplicate UPCs, dirty serving sizes, IU units,
whitespace/case noise, semi-join strays, duplicate measurements)."""

from __future__ import annotations

import pytest

from usda_food_data_pipeline_spark.plans.usda_pipeline import usda_pipeline


@pytest.fixture(scope="module")
def usda_inputs(spark):
    branded = spark.createDataFrame(
        [
            # u1: two records → keep fdc_id 11 (dedup-latest)
            (10, "u1", "  sugar, salt ", "12.5", "g"),
            (11, "u1", "sugar, salt", "12.5", "g"),
            # u2: dirty serving size → null
            (20, "u2", "water", "n/a", "ml"),
            # u3: IU unit → row dropped at the end
            (30, "u3", "vitamins", "5", "IU"),
            # u4: null ingredients → dropped by dropna
            (40, "u4", None, "1", "g"),
        ],
        "fdc_id long, gtin_upc string, ingredients string, serving_size string, serving_size_unit string",
    )
    food = spark.createDataFrame(
        [
            (11, " Choc Bar "),
            (20, "Water"),
            (30, "Vites"),
            (40, "Mystery"),
            (99, "NotBranded"),  # absent from branded → semi-join drops
        ],
        "fdc_id long, description string",
    )
    nutrient = spark.createDataFrame(
        [(1, "Protein", "G"), (2, "Energy", "KCAL")],
        "id long, name string, unit_name string",
    )
    food_nutrient = spark.createDataFrame(
        [
            (11, 1, 10.0),
            (11, 1, 20.0),  # duplicate measurement → averaged to 15.0
            (11, 2, 5000.0),  # above KCAL threshold (902) → nulled
            (20, 2, 100.0),
            (99, 1, 1.0),  # stray fdc_id → semi-join drops
        ],
        "fdc_id long, nutrient_id long, amount double",
    )
    return branded, food, nutrient, food_nutrient


def test_pipeline_golden(spark, usda_inputs):
    out = usda_pipeline(*usda_inputs)
    rows = {r["FOOD_RECORD_ID"]: r for r in out.collect()}
    # u3 dropped (IU), u4 dropped (null ingredients), u2 dropped (null
    # serving size in sane mode) → only the deduped u1 survivor remains
    assert set(rows) == {"11"}
    r = rows["11"]
    assert r["FOOD_ID"] == "U1"
    assert r["FOOD_NAME"] == "CHOC BAR"
    assert r["FOOD_SERVING_SIZE"] == "12.5 G"
    # SURVEY §1.2: typed pair exposed alongside the composite
    assert r["FOOD_SERVING_SIZE_VALUE"] == 12.5
    assert r["FOOD_SERVING_SIZE_UNIT"] == "G"
    assert r["FOOD_INGREDIENTS"] == "SUGAR, SALT"
    assert r["PROTEIN (G)"] == 15.0  # group-mean of duplicates
    assert r["ENERGY (KCAL)"] is None  # thresholded out
    # column order: fixed prefix then sorted nutrient labels (:111-114)
    assert out.columns == [
        "FOOD_RECORD_ID", "FOOD_ID", "FOOD_NAME", "FOOD_SERVING_SIZE",
        "FOOD_SERVING_SIZE_VALUE", "FOOD_SERVING_SIZE_UNIT",
        "FOOD_INGREDIENTS", "ENERGY (KCAL)", "PROTEIN (G)",
    ]


def test_pipeline_faithful_nan_mode(spark, usda_inputs):
    # faithful mode reproduces pandas 'nan G' artifact (SURVEY §1.4
    # gotcha 1): u2's null serving size becomes 'NAN ML' string-wise —
    # and therefore SURVIVES the dropna, like the reference
    out = usda_pipeline(*usda_inputs, faithful_nan=True)
    rows = {r["FOOD_RECORD_ID"]: r for r in out.collect()}
    assert set(rows) == {"11", "20"}
    assert rows["20"]["FOOD_SERVING_SIZE"] == "nan ML"
    # the typed pair stays honest in faithful mode: no fake 'nan' double
    assert rows["20"]["FOOD_SERVING_SIZE_VALUE"] is None
    assert rows["20"]["FOOD_SERVING_SIZE_UNIT"] == "ML"


def test_duplicate_nutrient_labels_disambiguated(spark, usda_inputs):
    """Two nutrients with identical (name, unit) → identical composite
    labels; pandas would emit duplicate columns (ambiguous downstream),
    sane mode suffixes the nutrient id."""
    branded, food, nutrient, food_nutrient = usda_inputs
    nutrient_dup = spark.createDataFrame(
        [(1, "Protein", "G"), (2, "Energy", "KCAL"), (3, "Protein", "G")],
        "id long, name string, unit_name string",
    )
    fn_extra = food_nutrient.union(
        spark.createDataFrame([(11, 3, 7.0)], "fdc_id long, nutrient_id long, amount double")
    )
    out = usda_pipeline(branded, food, nutrient_dup, fn_extra)
    assert "PROTEIN (G)" in out.columns and "PROTEIN (G) [3]" in out.columns
    r = out.collect()[0]
    assert r["PROTEIN (G)"] == 15.0 and r["PROTEIN (G) [3]"] == 7.0
