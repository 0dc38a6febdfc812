"""Windowed aggregations over event time (engine extension, SURVEY §2.8).

The reference has zero streaming operators; these are the Structured
Streaming extension the north star calls for. Spark's windowing API is
identical for batch and streaming DataFrames, so each function here:

- runs in BATCH mode over the static ``events`` table (oracle-checkable
  in DuckDB via time_bucket / gaps-and-islands SQL), and
- runs unchanged in STREAMING mode when handed a ``readStream`` frame —
  add ``withWatermark`` via the ``watermark`` argument for late-data
  bounds and state eviction.

Window starts are epoch-aligned (Spark's window origin is the Unix
epoch; DuckDB's time_bucket origin 2000-01-03 is 30-min-aligned with
it, so sub-hour buckets agree). Outputs use epoch seconds/micros —
integer-exact on both engines — never formatted timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import deterministic_sum


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark else df


def tumbling_window_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(window, key) count + exact sum over non-overlapping windows.

    Streaming shape: with a watermark, state for a window is dropped
    once event time passes window_end + watermark — bounded memory at
    any scale. One shuffle on (window, key).
    """
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_size), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            deterministic_sum(value_col).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in size/slide windows.
    Spark expands the event into its windows before the shuffle — the
    fan-out factor is the overlap count, the state bound is the same
    watermark story as tumbling."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_size, slide))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            deterministic_sum("value").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: per key, events closer than ``gap`` merge into
    one session; the session ends at last_event + gap (exclusive).

    Batch + streaming via ``session_window``; in streaming, merging
    sessions is stateful and requires the watermark. Output: key,
    session start/end in epoch micros, event count.
    """
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )
