"""In-engine trainable multinomial Naive-Bayes text classifier — the
fasttext-style quality/language classifier slot of a training-data
pipeline, expressed entirely as Spark aggregations (train) and a
broadcast join (score). No model file, no Python UDF: the "model" is
two small DataFrames (per-token class log-likelihoods, per-class
stats), derivable and servable inside the engine.

Reference analog: the reference's serving path classifies nothing —
it embeds and indexes (utils/upload_data_to_pinecone.py); a corpus
pipeline needs a cheap supervised filter ahead of that, and the
classic choice (CCNet, fastText quality filters) is a linear/NB model
over token counts.

Scale design (100 TB corpus):

- Training is two token-keyed aggregations with map-side partial
  combine: the exchanges carry (label, token, partial_count) rows —
  bounded by |vocab| × |classes|, not corpus token count.
- The model (vocab-wide table of per-class log-likelihoods) is
  |vocab| rows — broadcast at scoring; the corpus token stream joins
  map-side and reduces per (doc, class) with sum/count aggregates.
- Cross-engine exactness: log-likelihoods round onto a 9-dp decimal
  grid (the BM25 contract) so per-doc sums are independent of
  aggregation order in both Spark and the DuckDB oracle; argmax ties
  resolve in explicit ``classes`` order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import tokenize

LP_SCALE = 9
_LP_TYPE = f"decimal(18,{LP_SCALE})"


def _lp(col: Column) -> Column:
    return F.round(col, LP_SCALE).cast(_LP_TYPE)


def nb_train(
    df: DataFrame, label_col: str, text_col: str, classes: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB with add-one smoothing.

    Returns ``(model, stats)``:

    - ``model``: one row per vocabulary token, one ``lp_<c>`` column
      per class = ln((count(token|c)+1) / (tokens(c)+V)), null when
      the class never saw the token (the scorer substitutes the
      class's unseen log-likelihood).
    - ``stats``: ONE row with ``un_<c>`` (unseen log-likelihood) and
      ``pr_<c>`` (ln class prior) per class.

    ``classes`` is explicit — like pivot values, supplying it keeps
    training one aggregation pass (no distinct-label scan) and fixes
    the argmax tiebreak order.
    """
    toks = df.select(
        F.col(label_col).alias("_y"), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    # (label, token) counts feed THREE consumers (class totals, vocab
    # size, the model pivot); persist so the corpus token stream is
    # exploded and aggregated once — tc is |classes| x |vocab| rows
    tc = toks.groupBy("_y", "token").agg(F.count(F.lit(1)).alias("_c")).persist()
    # class token totals + overall vocab size: two tiny aggregates off
    # the (label, token) count table, broadcast back onto it
    totals = tc.groupBy("_y").agg(F.sum("_c").alias("_t"))
    vocab = tc.agg(F.count_distinct("token").alias("_V"))
    model = (
        tc.join(F.broadcast(totals), "_y")
        .crossJoin(F.broadcast(vocab))
        .groupBy("token")
        .agg(
            *[
                F.max(
                    F.when(
                        F.col("_y") == c,
                        _lp(F.log((F.col("_c") + F.lit(1.0)) / (F.col("_t") + F.col("_V")))),
                    )
                ).alias(f"lp_{c}")
                for c in classes
            ]
        )
    )
    ndocs = df.groupBy(F.col(label_col).alias("_y")).agg(F.count(F.lit(1)).alias("_nd"))
    stats = (
        totals.crossJoin(F.broadcast(vocab))
        .join(F.broadcast(ndocs), "_y")
        .agg(
            *[
                F.max(
                    F.when(F.col("_y") == c, _lp(F.log(F.lit(1.0) / (F.col("_t") + F.col("_V")))))
                ).alias(f"un_{c}")
                for c in classes
            ],
            *[
                F.max(F.when(F.col("_y") == c, F.col("_nd"))).alias(f"_nd_{c}")
                for c in classes
            ],
            F.sum("_nd").alias("_nd_all"),
        )
        .select(
            *[F.col(f"un_{c}") for c in classes],
            *[
                _lp(F.log(F.col(f"_nd_{c}") / F.col("_nd_all"))).alias(f"pr_{c}")
                for c in classes
            ],
        )
    )
    return model, stats


def nb_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    stats: DataFrame,
    classes: list[str],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Predicted class per document under the trained model.

    Per (doc, class): sum of matched log-likelihoods + (#unseen tokens
    × class unseen-lp) + class log-prior — all decimal arithmetic, so
    the total is aggregation-order-independent. The model joins by
    broadcast (vocab-sized); the token stream never shuffles raw — the
    per-doc exchange carries (doc, sum, count) aggregate rows.
    Documents with zero tokens are dropped (no evidence to score).
    """
    keep = keep_cols or []
    toks = df.select(
        F.col(id_col), *[F.col(c) for c in keep], F.explode(tokenize(F.col(text_col))).alias("token")
    )
    scored = (
        toks.join(F.broadcast(model), "token", "left")
        .groupBy(id_col, *keep)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(f"lp_{c}").alias(f"_s_{c}") for c in classes],
            *[F.count(f"lp_{c}").alias(f"_m_{c}") for c in classes],
        )
        .crossJoin(F.broadcast(stats))
    )
    totals = {
        c: (
            F.coalesce(F.col(f"_s_{c}"), F.lit(0).cast(_LP_TYPE))
            + (F.col("_n") - F.col(f"_m_{c}")) * F.col(f"un_{c}")
            + F.col(f"pr_{c}")
        )
        for c in classes
    }
    scored = scored.select(
        F.col(id_col), *[F.col(c) for c in keep], *[totals[c].alias(f"_t_{c}") for c in classes]
    )
    mx = F.greatest(*[F.col(f"_t_{c}") for c in classes])
    pred = None
    for c in reversed(classes):
        tail = F.lit(c) if pred is None else pred
        pred = F.when(F.col(f"_t_{c}") == mx, F.lit(c)).otherwise(tail)
    return scored.select(F.col(id_col), *[F.col(c) for c in keep], pred.alias("predicted"))


def nb_confusion(
    df: DataFrame, id_col: str, label_col: str, text_col: str, classes: list[str]
) -> DataFrame:
    """Self-train evaluation: train on the labeled corpus, score the
    same corpus, return the confusion matrix (label, predicted,
    n_docs) — the one-pass sanity check a labeling pipeline runs
    before trusting a model to filter at scale."""
    model, stats = nb_train(df, label_col, text_col, classes)
    scored = nb_score(df, id_col, text_col, model, stats, classes, keep_cols=[label_col])
    return (
        scored.groupBy(F.col(label_col), F.col("predicted"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
