"""Banded range join as a bucketed equi-join.

Engine extension (SURVEY §2.6): join a fact table against a dimension of
``[lo, hi)`` value bands. Spark's native plan for a pure range predicate is
a broadcast nested-loop join, which evaluates the predicate row-at-a-time
outside whole-stage codegen — measured 10.3s at sf0.1 vs ~1s for a hash
join, and the cost grows as fact_rows x band_rows at 100 TB.

Scale-safe rewrite: decompose each band into the fixed-width buckets it
overlaps (JVM-side ``sequence`` + ``explode`` — no driver collect of the
fact side), tag each fact row with ``floor(value / width)``, hash-join on
the bucket key, then refine the bucket-boundary rows with the residual
``lo <= v < hi`` predicate. Buckets are clamped to ``[-bucket_cap,
bucket_cap]`` so open-ended bands (``[3e5, 1e9)``, ``(-1e9, 0)``) and
pathological widths contribute at most ``2*cap+1`` bucket rows instead of
billions; every fact value beyond a clamp lands in the same clamped bucket
as the bands covering it, so no row is lost — only boundary-bucket rows pay
the residual filter. The exploded band table stays tiny (sum of per-band
bucket counts), is broadcast, and the join runs inside codegen.

Overlapping bands are fine: a fact row joins once per band whose interval
contains it (the bucket join produces a superset; the residual predicate
trims it).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width: float, cap: int) -> Column:
    # clamp in the double domain BEFORE the long cast: floor(v/width) on a
    # huge value / tiny width exceeds long range and would throw under ANSI
    clamped = F.greatest(
        F.least(F.floor(col / F.lit(width)), F.lit(float(cap))), F.lit(float(-cap))
    )
    return clamped.cast("long")


def derive_bucket_width(bands: DataFrame, lo_col: str = "lo", hi_col: str = "hi") -> float:
    """Median finite band width — each typical band then explodes to ~1-2
    buckets. ``bands`` is dimension-small by the :func:`band_join`
    contract (it gets broadcast), so the driver-side collect here reads
    the same handful of rows. Infinite/sentinel extents (|x| >= 1e15) are
    ignored; falls back to 1.0 when no finite band exists."""
    rows = bands.select(F.col(lo_col).alias("lo"), F.col(hi_col).alias("hi")).collect()
    widths = sorted(
        float(r["hi"]) - float(r["lo"])
        for r in rows
        if r["lo"] is not None
        and r["hi"] is not None
        and abs(r["lo"]) < 1e15
        and abs(r["hi"]) < 1e15
        and math.isfinite(r["hi"] - r["lo"])
        and r["hi"] > r["lo"]
    )
    if not widths:
        return 1.0
    return widths[len(widths) // 2]


def band_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float | None = None,
    bucket_cap: int = 4096,
) -> DataFrame:
    """Inner-join ``fact`` rows to the band(s) where ``lo <= value < hi``.

    ``bands`` must be small enough to broadcast after bucket explosion
    (bands x buckets-per-band rows); non-overlapping bands yield at most
    one output row per fact row, overlapping bands yield one per match.
    ``bucket_width=None`` derives the width from the band extents
    (median finite band width).
    """
    if bucket_width is None:
        bucket_width = derive_bucket_width(bands, lo_col, hi_col)
    if not (bucket_width > 0) or not math.isfinite(bucket_width):
        raise ValueError(f"bucket_width must be positive and finite, got {bucket_width}")
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
