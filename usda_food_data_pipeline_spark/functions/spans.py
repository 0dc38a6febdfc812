"""Cross-document duplicated-substring span detection.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") remove EXACT SUBSTRINGS that recur across a corpus, not just
whole near-duplicate documents: any k-token window that appears in more
than one document marks its positions as duplicated, and overlapping
marked windows merge into maximal spans (the unit a training pipeline
cuts out or down-weights).  Their reference implementation builds a
corpus-wide suffix array — inherently single-machine.  The relational
formulation below gets the same spans with three linear passes, each a
standard shuffle:

1. k-gram occurrences ``(doc, pos, gram_hash)`` — lead-window over the
   token stream (JVM codegen; no interpreted higher-order functions);
2. document frequency per gram hash — one slim fixed-width aggregate
   (the gram TEXT never shuffles; both engines hash with the portable
   ``md5_int``, so any hash collision is identical cross-engine);
3. per-document gaps-and-islands over the surviving start positions —
   window partitioned by doc, merging windows that overlap or touch
   (``start <= prev_start + k``) into one span.

Scale shape: every exchange is linear in the token stream and carries
fixed-width rows; the only per-doc state is the sorted position list
inside a single window partition.  No pair generation anywhere — df
counting replaces the suffix array's cross-doc matching.

Reference analog: none (the reference pipeline has no substring-level
dedup); extends SURVEY.md §2's dedup family per the LLM-pipeline
mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import md5_int, tokenize

HASH_SEED = 37
HASH_NIBBLES = 12


def dup_substring_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated-substring spans: merged runs of ``k``-token
    windows that occur in at least ``min_docs`` distinct documents.

    Returns one row per span:
    ``id_col, span_start, span_end (1-based token positions, inclusive),
    span_len, n_grams`` where ``n_grams`` counts the duplicated k-gram
    starts merged into the span.
    """
    tok = docs.select(
        F.col(id_col), F.posexplode(tokenize(F.col(text_col))).alias("i", "tok")
    ).withColumn("pos", F.col("i") + 1)

    wd = Window.partitionBy(id_col).orderBy("pos")
    gram_cols = [F.col("tok")] + [
        F.lead("tok", j).over(wd).alias(f"t{j}") for j in range(1, k)
    ]
    occ = (
        tok.select(id_col, "pos", *gram_cols)
        .filter(F.col(f"t{k - 1}").isNotNull())
        .select(
            id_col,
            "pos",
            md5_int(
                F.concat_ws(" ", "tok", *[f"t{j}" for j in range(1, k)]),
                HASH_SEED,
                HASH_NIBBLES,
            ).alias("h"),
        )
    )

    # document frequency over the 48-bit gram hash: slim two-level
    # aggregate (Catalyst expands countDistinct the same way)
    dup = (
        occ.groupBy("h", id_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df_docs"))
        .filter(F.col("df_docs") >= min_docs)
        .select("h")
    )
    starts = occ.join(dup, "h").select(id_col, "pos")

    # gaps-and-islands: spans [pos, pos+k-1] merge when the next start
    # overlaps or touches the running span (pos <= prev_pos + k)
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = starts.withColumn(
        "_new",
        F.when(
            F.col("pos") > F.coalesce(F.lag("pos").over(w), F.lit(-(10**9))) + k,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("_isl", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        isl.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
            "n_grams",
        )
    )
