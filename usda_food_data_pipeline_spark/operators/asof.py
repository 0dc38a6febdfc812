"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of existing DataFrame ops (the preferred
strategy order: composition > applyInPandas > mapPartitions): tag both
sides, union, and carry the right side's values forward with
``last(..., ignoreNulls)`` over a (key, time)-ordered window. One
shuffle on the key; no pandas, no per-group collect — the same plan a
hand-written merge_asof would need, but expressed so Catalyst/Tungsten
run it columnar.

Directions (pandas ``merge_asof`` parity):
- ``backward`` (default): most recent right row with ts' <= ts.
- ``forward``: earliest right row with ts' >= ts (same plan, window
  ordered descending — still one shuffle).
- ``nearest``: whichever of the two is closer in time; ties go
  backward. Both candidate windows share the single partitioning
  exchange (two sorts, no second shuffle).

Tie rules: a right row at exactly t is visible to a left row at t
because right rows sort before left rows at equal timestamps. Among
right rows sharing (key, ts), the row with the greatest value tuple
wins (struct comparison, nulls smallest) — resolved by a pre-aggregation
per (key, ts) BEFORE the union, so the window sorts only on
(ts, _side[, tiebreak]): a narrower sort key than ordering by the
carried values inside the window (round-2 design, 1.9x slower at
sf0.1), and the dedup is a map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _ts_number(col: Column, dtype) -> Column:
    """Monotone numeric image of the event time for distance compares.
    Integral inputs stay integral (a double cast would lose precision
    above 2^53, e.g. epoch-nanos in a long, and could flip the
    nearest-side pick on near-ties)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col)
    if isinstance(dtype, T.DateType):
        return F.unix_date(col).cast("long")
    if isinstance(dtype, _INTEGRAL):
        return col.cast("long")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    tiebreak_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the as-of right-side ``value_cols``
    per ``direction`` within the same ``by_cols`` group; null if none."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    left_cols = left.columns
    filled_names = [f"asof_{c}" for c in value_cols]

    # one right row per (key, ts): greatest value tuple wins — keeps the
    # value columns out of the window sort below
    right = (
        right.groupBy(*by_cols, ts_col)
        .agg(F.max(F.struct(*value_cols)).alias("_vs"))
        .select(*by_cols, ts_col, *[F.col(f"_vs.{c}").alias(c) for c in value_cols])
    )

    r = right.select(
        *by_cols,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in by_cols and c != ts_col],
    )
    l = left.select(
        *by_cols,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c) for c in left_cols if c not in by_cols and c != ts_col],
    )
    unioned = r.unionByName(l.select(r.columns))
    if direction == "nearest":
        # carry the matched right timestamp alongside the values so the
        # backward/forward candidates can be distance-compared
        unioned = unioned.withColumn(
            "_v_ts", F.when(F.col("_side") == 0, F.col(ts_col))
        )

    def window(desc: bool) -> Window:
        # right rows sort before left rows at equal ts in BOTH scan
        # directions: _side asc keeps a right row at exactly t visible
        order = [F.col(ts_col).desc() if desc else F.col(ts_col).asc(), F.col("_side")]
        if tiebreak_col is not None:
            tb = F.col(tiebreak_col)
            order.append(tb.desc_nulls_first() if desc else tb.asc_nulls_first())
        return (
            Window.partitionBy(*by_cols)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def carry(w: Window, suffix: str, with_ts: bool) -> list[Column]:
        cols = [
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(f"{n}{suffix}")
            for c, n in zip(value_cols, filled_names)
        ]
        if with_ts:
            cols.append(F.last(F.col("_v_ts"), ignorenulls=True).over(w).alias(f"_mts{suffix}"))
        return cols

    if direction == "backward":
        carried = unioned.select("*", *carry(window(desc=False), "", False))
        return carried.filter(F.col("_side") == 1).select(*left_cols, *filled_names)
    if direction == "forward":
        carried = unioned.select("*", *carry(window(desc=True), "", False))
        return carried.filter(F.col("_side") == 1).select(*left_cols, *filled_names)

    # nearest: both directions over the SAME partitioning (one exchange,
    # two in-partition sorts), then per-row distance pick; ties backward
    carried = unioned.select(
        "*",
        *carry(window(desc=False), "_b", True),
        *carry(window(desc=True), "_f", True),
    )
    dtype = left.schema[ts_col].dataType
    ts_n = _ts_number(F.col(ts_col), dtype)
    b_dist = ts_n - _ts_number(F.col("_mts_b"), dtype)
    f_dist = _ts_number(F.col("_mts_f"), dtype) - ts_n
    use_backward = F.col("_mts_f").isNull() | (F.col("_mts_b").isNotNull() & (b_dist <= f_dist))
    picked = [
        F.when(use_backward, F.col(f"{n}_b")).otherwise(F.col(f"{n}_f")).alias(n)
        for n in filled_names
    ]
    return carried.filter(F.col("_side") == 1).select(*left_cols, *picked)
