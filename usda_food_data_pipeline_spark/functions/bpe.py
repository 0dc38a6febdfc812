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
    encoding is embarrassingly parallel over documents.

    Prefer :func:`bpe_encode_arrow` on a hot path: the n_merges
    ``F.aggregate`` folds here are interpreted per element with
    array-copy accumulation, and the Arrow twin measured 0.75× on the
    full encode query (r12 opt; equality pinned by
    tests/test_opt_r12b.py on cascading/tie/empty cases and by the
    oracle gate). This form stays as the plan-only reference the
    oracle SQL mirrors."""

    def encode_word(w: Column) -> Column:
        syms = F.split(w, "")
        for _, left, right, _, _ in rules:
            syms = merge_pair(syms, left, right)
        return syms

    from ..operators.dedup import tokenize

    return F.flatten(F.transform(tokenize(text), encode_word))


def bpe_encode_arrow(tokens: Column, rules: list[tuple[int, str, str, str, int]]) -> Column:
    """Arrow-batched twin of :func:`bpe_encode` over an already-token-
    ized array column: one pandas_udf pass applies the whole merge
    table per word with plain-list greedy merges and a per-batch word
    cache (guide §4.2 — per-batch native beats n_merges interpreted
    expression folds; same-session A/B 0.75× on bpe_encode_stats).
    Arithmetic contract is IDENTICAL to the expression form: greedy
    left-to-right non-overlapping replacement per rule, rules in
    training order (pinned against :func:`bpe_encode` by
    tests/test_opt_r12b.py)."""
    from pyspark.sql.types import ArrayType, StringType

    rule_pairs = [(left, right, left + right) for _, left, right, _, _ in rules]

    @F.pandas_udf(ArrayType(StringType()))
    def _encode_tokens(tok_ser):
        import pandas as pd

        cache: dict = {}

        def enc_word(w):
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w)
            for left, right, merged in rule_pairs:
                out: list = []
                ap = out.append
                for s in syms:
                    if out and out[-1] == left and s == right:
                        out[-1] = merged
                    else:
                        ap(s)
                syms = out
            cache[w] = syms
            return syms

        res = []
        for toks in tok_ser:
            if toks is None:
                res.append([])
                continue
            pieces: list = []
            for w in toks:
                pieces.extend(enc_word(w))
            res.append(pieces)
        return pd.Series(res)

    return _encode_tokens(tokens)
