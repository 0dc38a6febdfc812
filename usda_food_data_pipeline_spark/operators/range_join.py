"""Banded range join as a bucketed equi-join.

Engine extension (SURVEY §2.6): join a fact table against a dimension of
``[lo, hi)`` value bands. Spark's native plan for a pure range predicate is
a broadcast nested-loop join, which evaluates the predicate row-at-a-time
outside whole-stage codegen — measured 10.3s at sf0.1 vs ~1s for a hash
join, and the cost grows as fact_rows x band_rows at 100 TB.

Scale-safe rewrite: decompose each band into the fixed-width buckets it
overlaps (JVM-side ``sequence`` + ``explode`` — no driver collect), tag
each fact row with ``floor(value / width)``, hash-join on the bucket key,
then refine the bucket-boundary rows with the residual ``lo <= v < hi``
predicate. Open-ended top bands are clamped to ``bucket_cap`` so a band
like ``[3e5, 1e9)`` contributes one clamped bucket row instead of 10^4;
every fact value above the cap lands in the same clamped bucket, so no row
is lost. The exploded band table stays tiny (sum of per-band bucket
counts), is broadcast, and the join runs inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width: float, cap: int) -> Column:
    return F.least(F.floor(col / F.lit(width)), F.lit(cap)).cast("long")


def band_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    bucket_cap: int = 4096,
) -> DataFrame:
    """Inner-join ``fact`` rows to the band(s) where ``lo <= value < hi``.

    ``bands`` must be small enough to broadcast after bucket explosion
    (bands x buckets-per-band rows); non-overlapping bands yield at most
    one output row per fact row, overlapping bands yield one per match.
    """
    v = F.col(value_col)
    fact_b = fact.withColumn("_bucket", _bucket(v, bucket_width, bucket_cap))
    # hi is exclusive; floor(hi/width) may add one harmless extra bucket on
    # an exact boundary — the residual predicate filters it.
    bands_b = bands.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _bucket(F.col(lo_col), bucket_width, bucket_cap),
                _bucket(F.col(hi_col), bucket_width, bucket_cap),
            )
        ),
    )
    joined = fact_b.join(F.broadcast(bands_b), "_bucket").where(
        (v >= F.col(lo_col)) & (v < F.col(hi_col))
    )
    return joined.drop("_bucket", lo_col, hi_col)
