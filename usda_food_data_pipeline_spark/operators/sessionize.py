"""Batch sessionization, time-series gap-fill, and interval overlap join.

Batch twins of the streaming session window (`streaming/windows.py`,
which uses ``F.session_window``): the batch path must also work on
historical reprocessing where the stream's state store is unavailable.

All three operators are pure DataFrame expressions — no UDFs, no
collect — and each performs exactly one shuffle keyed on the entity
(user/bucket), so they scale linearly with the event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cleaning import deterministic_avg, deterministic_sum


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the inter-event gap
    within a user exceeds ``gap_seconds``.

    Classic lag + cumulative-sum-of-flags; one shuffle on ``user_col``.
    Timestamps compare in integral microseconds (``unix_micros``) so the
    flag is exact — no float time arithmetic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    new_flag = (
        F.when(F.lag(us).over(w).isNull(), F.lit(1))
        .when(us - F.lag(us).over(w) > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    sessions = events.withColumn(
        "session_seq",
        F.sum(new_flag).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return sessions.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        deterministic_sum(value_col).alias("sum_value"),
    )


def gap_fill_daily(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user daily resample with gap filling.

    Emits one row per (user, day) for every day between the user's first
    and last event; days with no events get ``n_events = 0`` and carry
    the most recent prior day's mean value forward
    (``last(..., ignorenulls)`` over an ordered window).

    Plan: one aggregation shuffle to daily grain, a per-user
    ``sequence()`` + ``explode`` for the calendar spine (generated
    executor-side — no driver-side date loop), a key-local left join, and
    the forward-fill window on the same (already co-partitioned) user
    key. The calendar spine is bounded by the observed span, so output
    size is O(users × span-days), independent of raw event volume.
    """
    day = F.to_date(F.col(ts_col))
    daily = events.groupBy(F.col(user_col), day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        # exact-decimal sum / count: bit-identical on any engine
        deterministic_avg(value_col).alias("day_avg_value"),
    )
    spine = (
        daily.groupBy(user_col)
        .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
        .select(
            user_col,
            F.explode(F.sequence("_d0", "_d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    filled = spine.join(daily, [user_col, "day"], "left")
    wff = Window.partitionBy(user_col).orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return filled.select(
        user_col,
        "day",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.last("day_avg_value", ignorenulls=True).over(wff).alias("ffill_avg_value"),
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    value_decimals: int = 2,
) -> DataFrame:
    """Per-key time-weighted average (TWAP) over irregular samples:
    each observation holds its value until the next one, so

        twap = Σ value_i · (ts_{i+1} − ts_i)  /  Σ (ts_{i+1} − ts_i)

    (the final observation of a key has no holding interval and carries
    zero weight). One key-partitioned window (lead) + one aggregation —
    a single shuffle on the key.

    Cross-engine determinism: the value is exact at ``value_decimals``
    (prices/metrics), so it lifts to an exact BIGINT
    (``floor(value·10^d + 0.5)`` — engine-portable, unlike round()); value·weight products and their sums stay
    in BIGINT (associative, overflow-safe while
    max_value·10^d · key_time_span < 2^63), and the single int64→double
    conversion before the closing divisions is one well-defined IEEE
    rounding on any engine. (A DECIMAL product sum here exceeds 2^53
    and DuckDB's decimal→double cast double-rounds — observed 1-ulp
    drift; decimals only work when the final decimal fits a double
    exactly.) Returns ``(key, twap, total_us, n_obs)``.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    hold = F.lead(us).over(w) - us  # NULL for the last observation
    scale = 10 ** value_decimals
    v_int = F.floor((F.col(value_col) * scale) + F.lit(0.5)).cast("bigint")
    weighted = events.select(
        F.col(key_col), v_int.alias("_v"), hold.alias("_w")
    )
    agg = weighted.groupBy(key_col).agg(
        F.sum(F.col("_v") * F.col("_w")).alias("_vw"),  # bigint — exact
        # a key whose only rows are last-observations sums all-NULL → 0
        F.coalesce(F.sum("_w"), F.lit(0)).alias("_tw"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return agg.select(
        key_col,
        F.when(
            F.col("_tw") > 0,
            F.col("_vw").cast("double") / F.col("_tw") / F.lit(float(scale)),
        ).alias("twap"),
        F.col("_tw").cast("bigint").alias("total_us"),
        "n_obs",
    )


def rolling_hourly_anomaly(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    trailing_hours: int = 24,
) -> DataFrame:
    """Event-rate anomaly score: each (type, hour)'s count z-scored
    against the TRAILING ``trailing_hours`` window (the current hour
    excluded, so a spike can't mask itself).

    Two-level plan: the corpus-sized input collapses to the hourly
    grain first (one aggregation shuffle with map-side combine); the
    RANGE-frame window then runs over the tiny per-type hourly series —
    time-gap-aware (RANGE, not ROWS: silent hours don't stretch the
    lookback) and partitioned by type, so no global single-task window.

    Determinism: hourly counts are exact integers, so the trailing
    sum/sum-of-squares are exact; mean/variance/z derive from them with
    a fixed double expression tree — bit-identical on any engine.
    """
    hr = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(3_600_000_000)).cast("bigint")
    hourly = events.groupBy(F.col(type_col), hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.partitionBy(type_col)
        .orderBy("hr")
        .rangeBetween(-trailing_hours, -1)
    )
    win_n = F.count("n_events").over(w)
    win_sum = F.sum("n_events").over(w)
    win_sumsq = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    # guards: the first hour of a series has an EMPTY trailing window
    # (n=0 → no mean), and variance needs n ≥ 2 (ANSI division by zero)
    mean = F.when(win_n > 0, win_sum / win_n)
    # sample variance from exact integer sums: (Σx² − (Σx)²/n) / (n−1).
    # (Σx)² is computed as double × int64 — the SAME rounding order as
    # the oracle's CAST(sum AS DOUBLE) * sum — so the two engines agree
    # even once Σx exceeds 2^26.5 (where an exact int64 product would
    # round differently at the division) and the int64 product's own
    # overflow at Σx ≈ 3e9 can't occur
    var = F.when(
        win_n >= 2,
        (win_sumsq - win_sum.cast("double") * win_sum / win_n) / (win_n - 1),
    )
    z = F.when(var > 0, (F.col("n_events") - mean) / F.sqrt(var))
    return hourly.select(
        type_col,
        "hr",
        "n_events",
        # raw double: derived from exact integer sums by one division —
        # identical on any engine, and rounding would risk repr-vs-binary
        # tie divergence (see verify notes)
        mean.alias("trailing_mean"),
        z.alias("z_score"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join two interval sets on temporal overlap (half-open semantics:
    ``l.start < r.end AND r.start < l.end``).

    A naive theta-join is a cartesian product; instead each interval is
    exploded to the coarse time buckets it covers and the join runs as a
    bucket equi-join + exact overlap filter — the same banding trick as
    ``operators/range_join.py``, generalized to interval×interval. With
    bucket width ~ median interval length the per-bucket fan-out is O(1)
    and the join shuffles on a well-spread integer key. Output columns
    are all of ``left``'s plus all of ``right``'s (names must not
    collide).

    Multiplicity is EXACTLY the theta-join's: a pair that shares k
    buckets is emitted only in its canonical bucket — the one containing
    ``greatest(l.start, r.start)``, which both sides always cover when
    they overlap — instead of emitted k times and distinct()'d. That
    keeps duplicate input rows as duplicate output pairs (a whole-row
    distinct would collapse them; ADVICE r03) and removes the distinct's
    full-output shuffle from the plan.
    """

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        # floor, not cast-truncate: truncation rounds toward zero, which
        # mis-buckets pre-1970 (negative-epoch) timestamps
        b0 = F.floor(
            F.unix_micros(F.col(s)) / F.lit(bucket_seconds * 1_000_000)
        ).cast("long")
        # end is exclusive: an interval ending exactly on a bucket edge
        # does not cover that bucket
        b1 = F.floor(
            (F.unix_micros(F.col(e)) - F.lit(1)) / F.lit(bucket_seconds * 1_000_000)
        ).cast("long")
        return df.withColumn("_bucket", F.explode(F.sequence(b0, b1)))

    lb = bucketed(left, left_start, left_end)
    rb = bucketed(right, right_start, right_end)
    canonical = F.floor(
        F.unix_micros(F.greatest(F.col(left_start), F.col(right_start)))
        / F.lit(bucket_seconds * 1_000_000)
    ).cast("long")
    joined = lb.join(rb, "_bucket").filter(
        (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        # emit each overlapping pair once: only in the bucket holding the
        # overlap's start instant (covered by both sides by construction)
        & (F.col("_bucket") == canonical)
    )
    return joined.drop("_bucket")
