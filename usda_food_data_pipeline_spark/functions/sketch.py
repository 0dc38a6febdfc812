"""Count-Min Sketch over the corpus token stream (Cormode &
Muthukrishnan 2005) — the mergeable fixed-width counter structure a
100 TB pipeline uses where exact per-token counts no longer fit.

Why this is THE sketch shape for Spark:

- the sketch is a ``d × w`` counter table (here 4 × 1024 = 4096 rows,
  fixed FOREVER regardless of corpus size).  Building it is one
  aggregation over the exploded token stream keyed by (row, bucket):
  partial counts combine map-side, so every exchange carries at most
  ``d·w`` rows per task — the definition of mergeable.  Sharded
  corpora build shards independently and SUM the tables;
- estimation is ``min_r counters[r][h_r(token)]`` — one broadcast hash
  join of the candidate keys against the 4096-row counter table plus a
  map-side-combinable min (ADVICE r07 low: the previous plan-time
  literal map repeated a create_map with up to 8192 literal children
  once per depth arm — ~32k literal expressions in one projection,
  codegen-fallback territory; the broadcast join is the same lookup
  with constant-size expressions and no driver collect at all);
- the classic guarantee holds verbatim: estimates never undercount,
  and overshoot ≤ εN with probability 1-δ (ε = e/w, δ = e^-d).

Cross-engine exactness: bucket ids come from the portable ``md5_int``
hash and every counter is an integer sum, so the DuckDB oracle rebuilds
the identical sketch and the identical estimates — an exactly-twinnable
APPROXIMATE structure (the approximation is deterministic data
reduction, not randomness).

Reference analog: none (the reference has no sketching); extends the
SURVEY.md §2 text-analysis family per the LLM-pipeline mandate — token
frequency truncation/heavy-hitter lists are standard tokenizer-prep
and quality-filter inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import md5_int, tokenize

CMS_DEPTH = 4
CMS_WIDTH = 1024
# seeds for the d row hashes — disjoint from every other md5_int seed
# in the engine (17, 21, 29, 31, 37, split=3)
CMS_SEEDS = (101, 102, 103, 104)


def _bucket(col: Column, seed: int, width: int = CMS_WIDTH) -> Column:
    return md5_int(col, seed=seed, nibbles=8) % width


def cms_build(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The d×w counter table ``(r, b, c)`` over the corpus token stream.

    One explode + one aggregation; the (r, b) key space is 4096 values,
    so map-side combine bounds the exchange at 4096 rows per task and
    the result is a broadcast-sized, shard-mergeable artifact.
    """
    toks = docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
    keyed = toks.select(
        F.posexplode(
            F.array(*[_bucket(F.col("w"), s) for s in CMS_SEEDS])
        ).alias("r", "b")
    )
    return keyed.groupBy("r", "b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))


def cms_heavy_hitters(
    docs: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Top-``k`` tokens by Count-Min estimate, with the exact count
    alongside to exhibit the one-sided error guarantee.

    Returns ``(token, true_n, est_n, overcount)`` ordered by
    (est_n DESC, token), overcount = est_n - true_n ≥ 0 always.

    The candidate set here is the corpus vocabulary (the true counts
    ride the same vocab-bounded aggregate the estimate audit needs); at
    100 TB the candidate stream would instead be a bottom-k sample or
    an external watchlist — the sketch lookup is the same broadcast
    join either way and never rescans the corpus.

    Estimation plan (ADVICE r07 low — no literal map, no collect):
    each candidate fans out to its d (r, b) probe keys (scan-local
    posexplode), one broadcast hash join resolves the counters, and a
    map-side-combinable min folds them back to one row per candidate.
    Every probed bucket exists in the sketch by construction (a
    corpus-derived candidate contributed its own counts), so the inner
    join is lossless.
    """
    toks = docs.select(F.explode(tokenize(F.col(text_col))).alias("token"))
    truth = toks.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
    probes = truth.select(
        "token",
        "true_n",
        F.posexplode(
            F.array(*[_bucket(F.col("token"), s) for s in CMS_SEEDS])
        ).alias("r", "b"),
    )
    est = (
        probes.join(F.broadcast(cms_build(docs, text_col)), ["r", "b"])
        .groupBy("token", "true_n")
        .agg(F.min("c").alias("est_n"))
    )
    return (
        est.withColumn("overcount", F.col("est_n") - F.col("true_n"))
        .orderBy(F.col("est_n").desc(), F.col("token"))
        .limit(k)
    )
