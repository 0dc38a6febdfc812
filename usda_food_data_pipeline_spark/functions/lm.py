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
  logs rounded onto the shared 9-dp decimal grid (the BM25/NB
  cross-engine contract) so per-doc decimal sums are order-independent
  and hash-identical in DuckDB.

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

ALPHA = 0.4  # Brants et al.'s backoff constant
LP_SCALE = 9
_LP_TYPE = f"decimal(18,{LP_SCALE})"


def _lp(col: Column) -> Column:
    """Round a log score onto the cross-engine 9-dp decimal grid."""
    return F.round(col, LP_SCALE).cast(_LP_TYPE)


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
    uni, bg = lm_train_counts(
        docs.filter(F.col(source_col) == train_source), text_col
    )
    # 1-row total-token count; broadcast into the occurrence stream.
    tot = uni.agg(F.sum("c").cast("bigint").alias("n_total"))

    score = docs.filter(F.col(source_col) != train_source).select(
        F.col(id_col), tokenize(F.col(text_col)).alias("toks")
    )
    occ = (
        score.select(id_col, F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
        .select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    )

    up = uni.select(F.col("w").alias("prev"), F.col("c").alias("c_prev"))
    uc = uni.select(F.col("w").alias("cur"), F.col("c").alias("c_cur"))
    scored = (
        occ.join(bg.withColumnRenamed("c", "c_bg"), ["prev", "cur"], "left")
        .join(up, "prev", "left")
        .join(uc, "cur", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            F.when(
                F.col("c_bg").isNotNull(),
                # bigram seen ⇒ prev seen ⇒ c_prev non-null
                _lp(F.log(F.col("c_bg").cast("double") / F.col("c_prev").cast("double"))),
            )
            .otherwise(
                _lp(
                    F.log(
                        (F.lit(ALPHA) * F.coalesce(F.col("c_cur"), F.lit(1)).cast("double"))
                        / F.col("n_total").cast("double")
                    )
                )
            )
            .alias("v"),
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
