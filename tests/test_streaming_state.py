"""Streaming state-size evidence (r06 verdict task 7).

The stateful streaming operators have correctness twins but previously
no measurement that their STATE is bounded by the watermark horizon.
At 100 TB/day the difference between O(keys-in-window) and O(stream)
state is the difference between a running job and an OOM-ing one, so
this pins the state-store row counts reported by the engine
(``lastProgress.stateOperators[].numRowsTotal``) under watermark
eviction:

- a 100-hour event stream arrives as 10 time-ordered micro-batches
  (file source, maxFilesPerTrigger=1), watermark 2 hours;
- the windowed aggregate's final state must hold only the un-emitted
  tail of windows behind the watermark — never all 500 (window, key)
  groups the stream contains;
- scaling the PER-WINDOW volume 10× must leave the state row count
  EXACTLY unchanged (state tracks groups, not rows) while the input
  row count differs 10×.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from usda_food_data_pipeline_spark.streaming.windows import tumbling_window_agg
import pytest

N_HOURS = 100
N_FILES = 10
KEYS = ["a", "b", "c", "d", "e"]


def _write_stream_files(spark, base: str, rows_per_group: int) -> int:
    """10 parquet files, each covering 10 consecutive hours, written in
    time order with strictly increasing mtimes so the file source
    replays them as ordered micro-batches. Returns total rows."""
    total = 0
    hours_per_file = N_HOURS // N_FILES
    for i in range(N_FILES):
        h0 = i * hours_per_file
        df = (
            spark.range(hours_per_file * len(KEYS) * rows_per_group)
            .select(
                (F.lit(h0) + (F.col("id") % hours_per_file)).alias("_h"),
                F.element_at(
                    F.array(*[F.lit(k) for k in KEYS]),
                    ((F.col("id") / hours_per_file) % len(KEYS)).cast("int") + 1,
                ).alias("event_type"),
                (F.col("id") % 7).cast("double").alias("value"),
            )
            .select(
                F.timestamp_seconds(F.col("_h") * 3600 + 60).alias("ts"),
                "event_type",
                "value",
            )
        )
        path = os.path.join(base, f"part{i:02d}")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        # one flat dir of files for readStream; bump mtime per file so
        # the source's modification-time ordering matches event time
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                src = os.path.join(path, f)
                dst = os.path.join(base, f"f{i:02d}.parquet")
                os.replace(src, dst)
                ts = time.time() - (N_FILES - i) * 10
                os.utime(dst, (ts, ts))
        total += hours_per_file * len(KEYS) * rows_per_group
    return total


def _final_state_rows(spark, base: str) -> tuple[int, int]:
    """Run the watermarked tumbling aggregate over the staged files one
    micro-batch at a time; return (state rows after the last batch,
    emitted result rows)."""
    schema = spark.read.parquet(os.path.join(base, "f00.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(base, "f*.parquet"))
    )
    agg = tumbling_window_agg(stream, "1 hour", watermark="2 hours")
    name = f"state_probe_{abs(hash(base)) % 10**8}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        prog = q.lastProgress
        state_rows = sum(op["numRowsTotal"] for op in prog["stateOperators"])
        emitted = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"]
    finally:
        q.stop()
    return state_rows, emitted


@pytest.mark.slow
def test_windowed_state_is_watermark_bounded_not_stream_bounded(spark, tmp_path):
    base1 = str(tmp_path / "v1")
    base10 = str(tmp_path / "v10")
    os.makedirs(base1), os.makedirs(base10)
    n1 = _write_stream_files(spark, base1, rows_per_group=4)
    n10 = _write_stream_files(spark, base10, rows_per_group=40)
    assert n10 == 10 * n1  # the volume axis actually moved

    state1, emitted1 = _final_state_rows(spark, base1)
    state10, emitted10 = _final_state_rows(spark, base10)

    total_groups = N_HOURS * len(KEYS)  # 500 (window, key) groups overall
    # (a) state holds only the un-evicted tail behind the 2-hour
    # watermark — with 10-hour batches the lag is at most one batch of
    # windows plus the horizon: <= (10 + 2 + 1) hours x 5 keys
    bound = (N_HOURS // N_FILES + 3) * len(KEYS)
    assert 0 < state1 <= bound, (state1, bound)
    assert state1 < total_groups // 3  # nowhere near O(all groups)
    # (b) 10x the rows, IDENTICAL state: state tracks groups, not rows
    assert state10 == state1, (state1, state10)
    # (c) both runs emitted the same (volume-independent) window set
    assert emitted10 == emitted1 > 0


def _write_funnel_files(spark, base: str, rows_per_hour: int) -> int:
    """view/purchase event files for the stream-stream semi join, same
    10-file time-ordered layout as _write_stream_files."""
    total = 0
    hours_per_file = N_HOURS // N_FILES
    for i in range(N_FILES):
        h0 = i * hours_per_file
        df = (
            spark.range(hours_per_file * rows_per_hour)
            .select(
                (F.lit(h0) + (F.col("id") % hours_per_file)).alias("_h"),
                F.col("id").alias("event_id"),
                (F.col("id") % 20).alias("user_id"),
                F.when((F.col("id") % 2) == 0, "view").otherwise("purchase").alias("event_type"),
            )
            .select(
                F.timestamp_seconds(
                    F.col("_h") * 3600 + (F.col("event_id") % 50) * 60
                ).alias("ts"),
                "event_id",
                "user_id",
                "event_type",
            )
        )
        path = os.path.join(base, f"part{i:02d}")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                dst = os.path.join(base, f"f{i:02d}.parquet")
                os.replace(os.path.join(path, f), dst)
                ts = time.time() - (N_FILES - i) * 10
                os.utime(dst, (ts, ts))
        total += hours_per_file * rows_per_hour
    return total


def _funnel_state_rows(spark, base: str) -> int:
    from usda_food_data_pipeline_spark.streaming.dedup import streaming_funnel

    schema = spark.read.parquet(os.path.join(base, "f00.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(base, "f*.parquet"))
    )
    out = streaming_funnel(stream, max_lag="30 minutes", watermark="1 hour")
    name = f"funnel_state_{abs(hash(base)) % 10**8}"
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        state_rows = sum(op["numRowsTotal"] for op in q.lastProgress["stateOperators"])
    finally:
        q.stop()
    return state_rows


@pytest.mark.slow
def test_stream_stream_join_state_is_horizon_bounded(spark, tmp_path):
    """Stream-stream join state stores ROWS within the watermark + lag
    horizon (unlike the windowed agg's per-group state), so 10× volume
    legitimately costs 10× state — what must NOT happen is retention of
    the whole stream. Pin the evicted fraction: final state stays under
    ~2 batch-spans of rows while the stream holds 10 of them."""
    base1 = str(tmp_path / "f1")
    base10 = str(tmp_path / "f10")
    os.makedirs(base1), os.makedirs(base10)
    n1 = _write_funnel_files(spark, base1, rows_per_hour=40)
    n10 = _write_funnel_files(spark, base10, rows_per_hour=400)

    state1 = _funnel_state_rows(spark, base1)
    state10 = _funnel_state_rows(spark, base10)

    # horizon = one 10-hour batch span behind the watermark + 1h + lag;
    # both sides buffer, so allow 2 spans of BOTH-side rows — still a
    # 5x eviction vs the full stream, and the fraction must hold at 10x
    assert 0 < state1 <= 2 * (n1 // N_FILES) * 2, (state1, n1)
    assert state10 <= 2 * (n10 // N_FILES) * 2, (state10, n10)
    # eviction engaged on both runs: state is a minority of the stream
    assert state1 < n1 and state10 < n10 * 0.5


def _mg_run(spark, base: str, m: int):
    from usda_food_data_pipeline_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    schema = spark.read.parquet(os.path.join(base, "f00.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(base, "f*.parquet"))
    )
    out = streaming_heavy_hitters(stream, item_col="user_id", m=m)
    name = f"mg_{m}_{abs(hash(base)) % 10**8}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        state_rows = sum(op["numRowsTotal"] for op in q.lastProgress["stateOperators"])
        # update mode re-emits per batch; the LAST emission per
        # (event_type, item) carries the final summary
        rows = spark.sql(
            f"""SELECT event_type, item, est_count FROM (
                  SELECT *, row_number() OVER (
                      PARTITION BY event_type, item ORDER BY n_seen DESC
                  ) AS rn FROM {name}) WHERE rn = 1"""
        ).collect()
    finally:
        q.stop()
    est = {(r["event_type"], r["item"]): r["est_count"] for r in rows}
    return est, state_rows


@pytest.mark.slow
def test_misra_gries_stateful_heavy_hitters(spark, tmp_path):
    """Bounded-state continuous heavy hitters (streaming/stateful.py):
    with m >= distinct items the summary is exact; with small m the
    classic MG guarantees hold (est <= true, every item with true
    count > n/m survives); and the state store holds ONE row per
    key-group regardless of item cardinality or stream volume."""
    base = str(tmp_path / "mg")
    os.makedirs(base)
    _write_funnel_files(spark, base, rows_per_hour=40)

    truth_rows = spark.read.parquet(os.path.join(base, "f*.parquet")).groupBy(
        "event_type", F.col("user_id").cast("bigint").alias("item")
    ).count().collect()
    truth = {(r["event_type"], r["item"]): r["count"] for r in truth_rows}
    n_per_type = {}
    for (et, _), c in truth.items():
        n_per_type[et] = n_per_type.get(et, 0) + c

    exact, state_exact = _mg_run(spark, base, m=32)  # 20 distinct users
    # m >= distinct items: every count exact, nothing evicted
    final_exact = {k: v for k, v in exact.items() if v > 0}
    assert final_exact == truth
    assert state_exact == 2  # one state row per event_type, full stop

    small, state_small = _mg_run(spark, base, m=4)
    assert state_small == 2
    for k, est in small.items():
        assert est <= truth[k]  # MG never overcounts
    for (et, item), true_n in truth.items():
        if true_n > n_per_type[et] / 4:  # > n/m must survive the summary
            assert (et, item) in small and small[(et, item)] > 0


@pytest.mark.slow
def test_streaming_hll_matches_batch_sketch_and_bounds_state(spark, tmp_path):
    """Bounded-state continuous distinct counting (streaming/stateful.py):
    the per-key HLL registers after replaying the whole stream must
    EQUAL the batch sketch over the union of the data (registers are
    elementwise-max folds of a pure per-item function, so micro-batch
    partitioning cannot change them), the emitted estimate must be the
    batch estimator verbatim, and the state store holds ONE row per
    key-group regardless of item cardinality or stream volume."""
    from usda_food_data_pipeline_spark.functions.portable_ln import (
        py_grid_nanos,
        py_ln_int,
    )
    from usda_food_data_pipeline_spark.functions.sketch import HLL_M, _hll_alpha
    from usda_food_data_pipeline_spark.streaming.stateful import (
        _hll_hash,
        streaming_distinct_hll,
    )

    base = str(tmp_path / "hll")
    os.makedirs(base)
    _write_funnel_files(spark, base, rows_per_hour=40)

    schema = spark.read.parquet(os.path.join(base, "f00.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(base, "f*.parquet"))
    )
    out = streaming_distinct_hll(stream, item_col="user_id")
    name = f"hll_{abs(hash(base)) % 10**8}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        state_rows = sum(op["numRowsTotal"] for op in q.lastProgress["stateOperators"])
        rows = spark.sql(
            f"""SELECT event_type, est, v_zeros, s41 FROM (
                  SELECT *, row_number() OVER (
                      PARTITION BY event_type ORDER BY s41 ASC
                  ) AS rn FROM {name}) WHERE rn = 1"""
        ).collect()
    finally:
        q.stop()
    got = {r["event_type"]: (r["est"], r["v_zeros"], r["s41"]) for r in rows}

    # reference: batch registers over the union, same hash/estimator
    items = spark.read.parquet(os.path.join(base, "f*.parquet")).select(
        "event_type", F.col("user_id").cast("bigint").alias("item")
    ).distinct().collect()
    regs: dict[str, list[int]] = {}
    for r in items:
        js, rk = _hll_hash(int(r["item"]))
        rg = regs.setdefault(r["event_type"], [0] * HLL_M)
        rg[js] = max(rg[js], rk)
    assert set(got) == set(regs)
    for et, rg in regs.items():
        s41 = sum(1 << (41 - x) for x in rg)
        v = sum(1 for x in rg if x == 0)
        raw = ((_hll_alpha() * 65536.0) * 2199023255552.0) / float(s41)
        est = 256.0 * (py_ln_int(HLL_M) - py_ln_int(v)) if (v > 0 and raw <= 640.0) else raw
        est4 = float(py_grid_nanos(est, 4)) / 10000.0
        assert got[et] == (est4, v, s41), et
        # sanity: the estimate tracks the true per-key distinct count
        true_d = sum(1 for r in items if r["event_type"] == et)
        assert abs(est4 - true_d) / true_d < 0.25
    # one state row per key-group, regardless of distinct items
    assert state_rows == len(regs)
