"""Character-n-gram language identification (Cavnar & Trenkle 1994).

The published "N-Gram-Based Text Categorization" method: build a
per-language PROFILE — the top-M character trigrams by frequency, in
rank order — from a labeled training slice; classify a document by
building its own trigram rank profile the same way and summing the
OUT-OF-PLACE distance (|doc_rank − lang_rank|, with a fixed penalty of
M for trigrams missing from the language profile); predict the language
with the smallest distance.

Everything is counting and ranking — exact integers end to end, so the
prediction (including the argmin tie-break) is engine-exact with no
float anywhere.

Scale shape: the trigram explode is linear in corpus characters and
pre-aggregates (doc, trigram, count) map-side; language profiles are
``|langs| × M`` rows — broadcast forever; the per-doc profile is a
row_number window partitioned by doc; scoring is one broadcast join +
(doc, lang) aggregate.  Nothing pairs up and nothing corpus-sized
shuffles except the (doc, trigram) stream.

Complements :mod:`.classify` (word-level Naive Bayes over the same
labels): NB is the trainable-classifier slot, this is the classic
closed-form LID heuristic the task inventory names.

Fixture caveat: the driver testdata's ``lang`` labels are drawn
independently of its (shared, English-ish) synthetic vocabulary, so
fixture accuracy is chance-level for ANY classifier — the oracle gate
attests exactness there; `tests/test_langid.py` attests separation
power on corpora whose languages actually differ.

Reference analog: none; extends SURVEY.md §2's text-analysis family
per the LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PROFILE_M = 100


def _doc_trigrams(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """(id_cols…, tri, cnt): non-distinct char-trigram counts of the
    lowercased text (spaces included, the published formulation)."""
    s = F.lower(F.col(text_col))
    # substring with a COLUMN start position needs the SQL expression
    # form; F.substring only takes literal positions
    ex = df.select(*id_cols, s.alias("_s")).select(
        *id_cols,
        "_s",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("_s") - 2, F.lit(0)))
        ).alias("_g"),
    )
    return (
        ex.select(*id_cols, F.expr("substring(_s, _g, 3)").alias("tri"))
        .groupBy(*id_cols, "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _rank_profile(counted: DataFrame, key_cols: list[str], m: int) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("cnt").desc(), F.col("tri")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select(*key_cols, "tri", "rank")
    )


def langid_ngram(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    train_mod: int = 5,
    m: int = PROFILE_M,
) -> DataFrame:
    """Train on ``id % train_mod == 0``, classify the rest.

    Returns ``id_col, pred_lang, actual_lang, distance`` — distance is
    the exact integer out-of-place score of the winning language.
    """
    train = docs.filter(F.col(id_col) % train_mod == 0)
    score = docs.filter(F.col(id_col) % train_mod != 0)

    lang_prof = _rank_profile(
        _doc_trigrams(train, [label_col], text_col), [label_col], m
    ).select(F.col(label_col).alias("_pl"), "tri", F.col("rank").alias("_lr"))

    doc_prof = _rank_profile(
        _doc_trigrams(score, [id_col], text_col), [id_col], m
    )

    # languages come from the raw training slice, NOT from
    # lang_prof.select().distinct(): the latter is logically derived but
    # Catalyst finds no exchange to reuse and rebuilds the whole
    # trigram-count + rank-window pipeline a second time (measured two
    # extra shuffles in the executed plan)
    langs = train.select(F.col(label_col).alias("_pl")).distinct()
    # every (doc-profile trigram, language) pair scores: matched trigrams
    # contribute |doc_rank - lang_rank|, unmatched the fixed penalty m
    dist = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lang_prof), ["_pl", "tri"], "left")
        .groupBy(id_col, "_pl")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("rank") - F.col("_lr")), F.lit(m)
                )
            ).alias("distance")
        )
    )
    w = Window.partitionBy(id_col).orderBy("distance", "_pl")
    pred = (
        dist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("_pl").alias("pred_lang"), "distance")
    )
    return pred.join(
        score.select(id_col, F.col(label_col).alias("actual_lang")), id_col
    ).select(id_col, "pred_lang", "actual_lang", "distance")
