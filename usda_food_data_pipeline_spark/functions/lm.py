"""Corpus n-gram language-model scoring (stupid backoff).

CCNet/Gopher-style pipelines filter web text by language-model score: an
LM trained on a trusted reference corpus scores each candidate document,
and low-probability (gibberish / boilerplate / wrong-language) documents
are dropped.  At 100 TB a full KenLM is external state; *stupid backoff*
(Brants et al. 2007, "Large Language Models in Machine Translation")
was designed exactly for this regime — unnormalized count-ratio scores
with a constant backoff factor, no discount estimation, trivially
distributed because the "model" is two count tables produced by plain
aggregations.

Shape (all linear, no pair generation):

- train: tokenize the reference slice once; unigram counts (map-side
  combine, vocab-bounded exchange) and bigram-instance counts (exchange
  bounded by distinct bigrams).
- score: explode each candidate doc's adjacent token pairs (zipped
  shifted slices, scan-local) and resolve each occurrence against the
  two count tables — three hash joins that AQE broadcasts when the
  vocabulary fits (reference vocabularies are ~1e7 rows ≪ fact side).
- S(cur|prev) = c(prev,cur)/c(prev) when the bigram was seen, else
  ALPHA·c(cur)/N (unseen cur falls to ALPHA·1/N).  Scores are natural
  logs snapped onto the shared 9-dp decimal grid so per-doc decimal
  sums are order-independent; the logs themselves are PORTABLE
  (functions/portable_ln): driver Python evaluates the fixed-form
  IEEE software-ln over the bounded distinct count values and ships
  the doubles as broadcast literal tables, the in-plan ratio combine
  is one double subtraction (ln(a/b) = ln a − ln b; the backoff ratio
  0.4·c/N decomposes to integers as ln(2c) − ln(5N)), and the grid
  snap is floor(v·1e9 + 0.5) integer math — no libm anywhere on
  either side of the comparison (r07 verdict #1: any scheme that
  lets SOME engine's libm compute the log loses an ULP at grid
  boundaries on a different build; round 6 lost JVM-vs-driver-DuckDB,
  round 7 lost local-DuckDB-vs-driver-DuckDB).

The keep/drop decision compares the decimal sum against a per-token
threshold via exact decimal·int cross-multiplication — no division in
any compared column.

Reference analog: none (the reference pipeline has no quality model);
this extends SURVEY.md §2's text-analysis family per the LLM-pipeline
mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import tokenize

# Brants et al.'s backoff constant. Encoded in the scoring path as the
# exact integer ratio 2/5 (ln(0.4·c/N) = ln(2c) - ln(5N)) — changing it
# means changing that decomposition, not just this value.
ALPHA = 0.4
LP_SCALE = 9
_LP_TYPE = f"decimal(18,{LP_SCALE})"


def _adjacent_pairs(toks: Column) -> Column:
    """Non-distinct adjacent token pairs as an array of (prev, cur)
    structs — zipped shifted slices, scan-local (the word_shingles
    pattern; no index re-evaluation)."""
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.arrays_zip(
        F.slice(toks, 1, m).alias("prev"), F.slice(toks, 2, m).alias("cur")
    )


def lm_train_counts(
    train_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(unigram counts ``w, c``, bigram counts ``prev, cur, c``) over the
    reference corpus.  Both are plain aggregations whose exchanges carry
    count rows only (vocab- / bigram-bounded, never corpus-bounded)."""
    toks = train_docs.select(tokenize(F.col(text_col)).alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bg = (
        toks.select(F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
        .select(F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c"))
    )
    return uni, bg


def lm_score_stupid_backoff(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    train_source: str = "src0",
    keep_lp_per_token: str = "-8.0",
) -> DataFrame:
    """Score every non-reference document under a stupid-backoff bigram
    LM trained on ``source == train_source``.

    Returns one row per scored document:
    ``id_col, n_bigrams (int), sum_lp (decimal(38,9)), keep (bool)``
    where ``keep`` ⇔ mean log-score ≥ ``keep_lp_per_token`` — decided as
    ``sum_lp ≥ threshold · n_bigrams`` (exact decimal arithmetic).
    Zero-bigram documents (≤1 token) score 0 and are kept.
    """
    from .portable_ln import (
        grid_decimal_col,
        grid_nanos_col,
        literal_table,
        py_ln_int,
    )
    from ..operators.dedup import _INTERMEDIATES

    spark = docs.sparkSession
    # tokenize the training slice ONCE: both count tables read this
    # cache (r07 verdict task 6 — the model-build jobs previously
    # re-tokenized the slice per consumer).  Released below as soon as
    # uni/bg are materialized; never escapes this function.
    toks = (
        docs.filter(F.col(source_col) == train_source)
        .select(tokenize(F.col(text_col)).alias("toks"))
        .persist()
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bg = (
        toks.select(F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
        .select(F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c"))
    )
    # The model tables feed several consumers (log-table collects + the
    # scoring joins); persist so each is aggregated once.
    # Janitor-tracked: the NEXT tracked operator call retires them.
    uni = uni.persist()
    bg = bg.persist()
    _INTERMEDIATES.rollover([uni, bg])

    # Portable log tables (see module docstring): two bounded driver
    # jobs build everything — distinct bigram counts, and one pass over
    # the unigram table for (N_total, distinct unigram counts) — run
    # CONCURRENTLY (Spark schedules independent jobs in parallel; both
    # read the toks cache, so the slice tokenizes once in whichever job
    # lands first).  The collected value domains are count-value
    # cardinalities (heavy-tailed counts ⇒ tiny), never vocab- or
    # corpus-sized.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as pool:
        f_bg = pool.submit(
            lambda: sorted(int(r["c"]) for r in bg.select("c").distinct().collect())
        )
        f_uni = pool.submit(
            lambda: uni.agg(
                F.sum("c").alias("_n"), F.collect_set("c").alias("_vals")
            ).collect()[0]
        )
        bg_vals, st = f_bg.result(), f_uni.result()
    toks.unpersist()
    n_total = int(st["_n"] or 0)
    uni_vals = sorted(int(v) for v in (st["_vals"] or []))
    back_vals = sorted({1} | set(uni_vals))
    ln_bg = literal_table(
        spark, [(c, py_ln_int(c)) for c in bg_vals], "c_bg bigint, _lnbg double"
    )
    ln_prev = literal_table(
        spark, [(c, py_ln_int(c)) for c in uni_vals], "c_prev bigint, _lnprev double"
    )
    # backoff ratio 0.4·c/N == 2c / 5N as an exact integer ratio
    ln_back = literal_table(
        spark,
        [(c, py_ln_int(2 * c)) for c in back_vals],
        "c_cur_eff bigint, _lnback double",
    )
    ln_5n = py_ln_int(5 * max(n_total, 1))

    up = uni.select(F.col("w").alias("prev"), F.col("c").alias("c_prev"))
    uc = uni.select(F.col("w").alias("cur"), F.col("c").alias("c_cur"))

    score = docs.filter(F.col(source_col) != train_source).select(
        F.col(id_col), tokenize(F.col(text_col)).alias("toks")
    )
    occ = (
        score.select(id_col, F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
        .select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    )

    # In-plan combine + snap, mirroring the oracle text op for op:
    # (lnbg - lnprev) when the bigram was seen (⇒ prev seen ⇒ both
    # lookups hit), else (lnback - ln5n); then floor(v·1e9 + 0.5) and
    # one exact decimal multiply — plain IEEE arithmetic inside
    # whole-stage codegen, no transcendental in the plan.
    v = F.when(
        F.col("c_bg").isNotNull(), F.col("_lnbg") - F.col("_lnprev")
    ).otherwise(F.col("_lnback") - F.lit(ln_5n))
    scored = (
        occ.join(bg.withColumnRenamed("c", "c_bg"), ["prev", "cur"], "left")
        .join(up, "prev", "left")
        .join(uc, "cur", "left")
        .withColumn("c_cur_eff", F.coalesce(F.col("c_cur"), F.lit(1)))
        .join(F.broadcast(ln_bg), "c_bg", "left")
        .join(F.broadcast(ln_prev), "c_prev", "left")
        .join(F.broadcast(ln_back), "c_cur_eff", "left")
        .select(
            id_col,
            grid_decimal_col(grid_nanos_col(v), 18, LP_SCALE).alias("v"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.sum("v").cast(f"decimal(38,{LP_SCALE})").alias("sum_lp"),
    )
    thr = F.lit(keep_lp_per_token).cast(_LP_TYPE)
    return (
        score.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("int").alias("n_bigrams"),
            F.coalesce(F.col("sum_lp"), F.lit(0).cast(f"decimal(38,{LP_SCALE})")).alias(
                "sum_lp"
            ),
            (
                F.coalesce(F.col("sum_lp"), F.lit(0).cast(f"decimal(38,{LP_SCALE})"))
                >= thr * F.coalesce("n_bigrams", F.lit(0))
            ).alias("keep"),
        )
    )
