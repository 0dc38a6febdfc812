"""In-engine BPE tokenizer training: the iterative merge loop.

`textstats.bpe_pair_counts` implements ONE trainer iteration (the
corpus-wide pair count); this module runs the full Sennrich et al.
training loop and can apply the learned merges back to text.

Scale contract (the reason BPE training is feasible on a 100 TB
corpus): after one corpus-sized aggregation the loop operates entirely
on the **distinct-word frequency table** — vocabulary-sized (Heaps'
law: ~millions of rows for terabytes of text), not corpus-sized. Each
iteration is then:

  1. one pair-count aggregation over the word table (map-side combine;
     the exchange carries (pair, partial_sum) rows bounded by the pair
     alphabet);
  2. a 1-row global argmax collected to the driver — the same
     sanctioned driver-decision shape as the CC convergence probe
     (operators/dedup.py) and the IVF centroid rank;
  3. an expression-only merge application (fold over each word's symbol
     array — whole-stage codegen, no UDF), localCheckpoint'ed to keep
     the plan depth constant across iterations.

No SQL oracle exists for the loop (iterative global argmax), so the
registered query is rows-only at the driver; exact parity with a pure
Python reference implementation is pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequency(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, weight) distinct-word table. The ONLY
    corpus-sized aggregation in BPE training."""
    from ..operators.dedup import tokenize
    from ..sources.tables import spread

    words = spread(df.select(F.col(text_col))).select(
        F.explode(tokenize(F.col(text_col))).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("weight"))


def _adjacent_pairs(symbols: Column) -> Column:
    """array<string> → array<struct<left,right>> of adjacent pairs."""
    n = F.greatest(F.size(symbols) - 1, F.lit(0))
    return F.zip_with(
        F.slice(symbols, 1, n),
        F.slice(symbols, 2, n),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )


def merge_pair(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of the (left, right)
    pair inside a symbol array — pure expression fold (codegen'd), the
    exact replacement semantics of the Sennrich trainer."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_count: int = 2,
) -> list[tuple[int, str, str, str, int]]:
    """Train ``n_merges`` BPE merge rules on a text corpus.

    Returns ``[(step, left, right, merged, pair_count), ...]`` in merge
    order — the tokenizer's merge table. Stops early when the best
    remaining pair occurs fewer than ``min_count`` times (weighted by
    word frequency). Ties break on (count desc, left, right) so the
    learned rules are deterministic on any partitioning.
    """
    vocab = word_frequency(df, text_col).withColumn(
        "symbols", F.split(F.col("word"), "")
    )
    vocab = vocab.select("symbols", "weight").localCheckpoint(eager=True)

    rules: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            vocab.select(
                F.explode(_adjacent_pairs(F.col("symbols"))).alias("p"), "weight"
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("weight").alias("n"))
            .orderBy(F.col("n").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        left, right, n = best[0]["left"], best[0]["right"], int(best[0]["n"])
        rules.append((step, left, right, left + right, n))
        vocab = vocab.select(
            merge_pair(F.col("symbols"), left, right).alias("symbols"), "weight"
        ).localCheckpoint(eager=True)
    return rules


def bpe_rules_df(spark, rules: list[tuple[int, str, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        rules, "step int, left string, right string, merged string, pair_count bigint"
    )


def bpe_encode(text: Column, rules: list[tuple[int, str, str, str, int]]) -> Column:
    """Apply a trained merge table to text: per word, split to chars
    and fold every rule in training order. Expression-only — the merge
    table is compiled into the plan (a broadcast-free 'tiny dim'), so
    encoding is embarrassingly parallel over documents."""
    from ..operators.dedup import tokenize

    def encode_word(w: Column) -> Column:
        syms = F.split(w, "")
        for _, left, right, _, _ in rules:
            syms = merge_pair(syms, left, right)
        return syms

    return F.flatten(F.transform(tokenize(text), encode_word))
