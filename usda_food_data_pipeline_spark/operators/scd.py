"""Slowly-changing-dimension (SCD type 2) history construction:
turn an event/update stream into validity-interval versions per key.

The warehouse-side temporal versioning op a training-data pipeline uses
to snapshot mutable metadata (source labels, license states, quality
tiers) as of any point in time — the batch twin of a CDC merge.

Scale notes: both window passes share one hash partitioning on the key
(single shuffle; the second Window reuses the first's sort order), and
change-compaction drops unchanged consecutive rows BEFORE the lead()
pass, so the history table is bounded by the number of actual changes,
not the number of observations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str | Column,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build SCD2 validity intervals for ``attr_cols`` per ``key_col``.

    - rows are ordered per key by (``ts_col``, ``tiebreak_col``) — pass
      a unique tiebreak when timestamps can collide, or interval
      boundaries become nondeterministic;
    - consecutive rows whose tracked attributes are unchanged are
      compacted away (null-safe struct comparison);
    - each surviving change row becomes a version with
      ``valid_from`` = its ts, ``valid_to`` = the next change's ts
      (null for the current version), ``is_current`` flag.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    order = [ts.asc()] + ([F.col(tiebreak_col).asc()] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = df.withColumn("_prev", F.lag(attrs).over(w)).filter(
        F.col("_prev").isNull() | ~attrs.eqNullSafe(F.col("_prev"))
    )
    # lead() over the compacted set: same partitioning, same ordering —
    # Catalyst stacks this Window on the first one without a new exchange
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        changed.withColumn("valid_from", ts)
        .withColumn("valid_to", F.lead(ts).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_prev")
    )
