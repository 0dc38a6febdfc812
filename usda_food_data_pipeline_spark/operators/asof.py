"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of existing DataFrame ops (the preferred
strategy order: composition > applyInPandas > mapPartitions): tag both
sides, union, and carry the right side's values forward with
``last(..., ignoreNulls)`` over a (key, time)-ordered window. One
shuffle on the key; no pandas, no per-group collect — the same plan a
hand-written merge_asof would need, but expressed so Catalyst/Tungsten
run it columnar.

Tie rule: a right row at exactly t is visible to a left row at t
(asof <=) because right rows sort before left rows at equal
timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent (ts' <= ts) right-side
    ``value_cols`` within the same ``by_cols`` group; null if none."""
    left_cols = left.columns
    filled_names = [f"asof_{c}" for c in value_cols]

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
    order = [F.col(ts_col), F.col("_side")]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc_nulls_first())
    # deterministic pick among right rows sharing (key, ts): order by the
    # carried values themselves (nulls last so left rows stay put) — the
    # SQL twin must order identically
    order.extend(F.col(f"_v_{c}").asc_nulls_last() for c in value_cols)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l.select(r.columns))
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(n)
            for c, n in zip(value_cols, filled_names)
        ],
    )
    return carried.filter(F.col("_side") == 1).select(*left_cols, *filled_names)
