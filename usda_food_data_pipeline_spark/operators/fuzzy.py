"""Record linkage: blocked fuzzy self-join on edit distance.

Entity resolution is a core large-corpus need (merging crawl metadata,
author/product/entity tables). A naive fuzzy join is O(n²) levenshtein
evaluations — never viable at scale. Blocking scheme: **symmetric
deletes** (the SymSpell idea). For ``lev(a, b) <= 1`` there is always a
string reachable from BOTH by deleting at most one character: take an
optimal alignment — a substitution deletes the differing char on both
sides, an insertion/deletion deletes it on the longer side, equality
keeps both strings as-is. So indexing every string under
``{s} ∪ {s minus one char}`` guarantees every true pair shares a block
key, including boundary-shifting insertions (which defeat naive
fixed-chunk blocking).

Plan shape:

1. scan-local expansion to the ≤ len+1 deletion variants per string
   (array expression, distinct);
2. ONE equi-join keyed on the variant string (hash shuffle on
   well-spread keys — the variant only collides for near-identical
   strings, so bucket sizes track true duplicate density, not n);
3. distinct candidate pairs, then the exact codegen'd ``levenshtein``
   filter.

Cost is candidate-bounded: Σ (block size)² over variant buckets —
driven by real near-dup density. The exact filter touches candidates
only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column) -> Column:
    """``s`` plus every string obtained by deleting exactly one
    character — the lev<=1 symmetric-delete block keys (distinct)."""
    one_del = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substring(col, 1, (i - 1).cast("int")),
            # substring with a huge length = "rest of the string"
            F.substring(col, (i + 1).cast("int"), 0x7FFFFFFF),
        ),
    )
    return F.array_distinct(F.concat(F.array(col), one_del))


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (a, b) with ``a.id < b.id`` and
    ``levenshtein(a.text, b.text) <= max_dist``.

    ``max_dist`` must be 1 (the one-deletion index guarantees
    completeness exactly for lev <= 1; deeper neighborhoods grow as
    len^d — generate them recursively if a use case ever needs d=2).

    Returns ``(id_a, id_b, text_a, text_b, dist)``.
    """
    if max_dist != 1:
        raise ValueError("fuzzy_self_join supports max_dist=1")
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    keyed = base.select(
        "_id", "_txt", F.explode(deletion_variants(F.col("_txt"))).alias("_blk")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cands = (
        a.join(b, F.col("a._blk") == F.col("b._blk"))
        .filter(F.col("a._id") < F.col("b._id"))
        # a pair sharing k variants appears k times — collapse BEFORE
        # the levenshtein evaluation
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._txt").alias("text_a"),
            F.col("b._txt").alias("text_b"),
        )
        .distinct()
    )
    return cands.select(
        "*", F.levenshtein("text_a", "text_b").alias("dist")
    ).filter(F.col("dist") <= max_dist)
