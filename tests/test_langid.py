"""Cavnar-Trenkle language ID on distinguishable corpora.

(The driver fixture's `lang` labels are uncorrelated with its shared
synthetic vocabulary, so fixture accuracy sits at chance for ANY
method; the oracle gate checks exactness there, this checks the method
separates languages that actually differ.)
"""

from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.functions.langid import langid_ngram

EN = "the quick brown fox jumps over the lazy dog and then runs through the green fields while singing"
DE = "der schnelle braune fuchs springt über den faulen hund und läuft durch die grünen felder während er singt"
FR = "le rapide renard brun saute par dessus le chien paresseux et court à travers les champs verts en chantant"


def _docs(spark):
    rows = []
    for base, lang, texts in [
        (0, "en", EN), (1, "de", DE), (2, "fr", FR),
    ]:
        # ids spread across train (id%5==0) and score slices
        for j in range(10):
            rows.append((base + 3 * j, texts + f" v{j}", lang))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_langid_separates_real_languages(spark):
    out = langid_ngram(_docs(spark), train_mod=5, m=50).collect()
    assert len(out) > 0
    acc = sum(r["pred_lang"] == r["actual_lang"] for r in out) / len(out)
    assert acc == 1.0


def test_langid_distance_is_exact_integer(spark):
    out = langid_ngram(_docs(spark), train_mod=5, m=50)
    assert dict(out.dtypes)["distance"] == "bigint"
    assert out.filter(F.col("distance") < 0).count() == 0
