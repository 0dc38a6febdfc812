"""Custom stateful streaming operator via ``applyInPandasWithState``.

Engine extension (SURVEY §2.8): the reference's only "state" is the
chat session dict (usda-food-assistant/app.py:104-124); the engine's
analog is keyed streaming state. Example operator: running per-key
event counter + value sum that emits one update row per micro-batch.

Pandas is the right tool here (Arrow-batched per key-group); this is
one of the two sanctioned Python paths in the engine (the other is
embedding UDFs, SURVEY §2.9).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("v", DoubleType()),
    ]
)


def _update_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (event_type,) = key
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"event_type": [event_type], "total_events": [n], "total_value": [v]}
    )


def running_totals(events_stream: DataFrame) -> DataFrame:
    """Per-event-type running totals with explicit keyed state.

    Works on a streaming DataFrame; each micro-batch emits the updated
    totals for the keys it touched. State is per-key and lives in the
    state store (RocksDB/HDFS-backed on a cluster)."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Misra-Gries heavy hitters per key-group -------------------------------

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("item", LongType()),
        StructField("est_count", LongType()),
        StructField("n_seen", LongType()),
    ]
)

MG_STATE_SCHEMA = StructType(
    [
        StructField("items", StringType()),   # csv of item ids (bounded: m)
        StructField("counts", StringType()),  # csv of their counters
        StructField("n", LongType()),         # total observations folded
    ]
)


def _mg_fold(counters: dict[int, int], item: int, cnt: int, m: int) -> None:
    """Fold ``cnt`` observations of ``item`` into a Misra-Gries summary
    of at most ``m`` counters (the decrement step removes one unit from
    every counter when full — the classic space-saving trade)."""
    if item in counters:
        counters[item] += cnt
        return
    while cnt > 0:
        if len(counters) < m:
            counters[item] = cnt
            return
        dec = min(cnt, min(counters.values()))
        cnt -= dec
        for k in list(counters):
            counters[k] -= dec
            if counters[k] <= 0:
                del counters[k]


def make_mg_update(m: int):
    """Build the applyInPandasWithState update fn for an ``m``-counter
    Misra-Gries summary per key. Batch rows are pre-aggregated and
    folded in (count DESC, item ASC) order so the summary is a
    deterministic function of the micro-batch sequence."""

    def update(key: tuple, pdfs, state: GroupState):
        (event_type,) = key
        if state.exists:
            items_s, counts_s, n = state.get
            counters = (
                dict(zip((int(x) for x in items_s.split(",")),
                         (int(x) for x in counts_s.split(","))))
                if items_s
                else {}
            )
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            agg = pdf.groupby("item").size()
            n += int(agg.sum())
            for item, cnt in sorted(agg.items(), key=lambda kv: (-kv[1], kv[0])):
                _mg_fold(counters, int(item), int(cnt), m)
        order = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update((
            ",".join(str(k) for k, _ in order),
            ",".join(str(v) for _, v in order),
            n,
        ))
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(order),
                "item": [k for k, _ in order],
                "est_count": [v for _, v in order],
                "n_seen": [n] * len(order),
            }
        )

    return update


def streaming_heavy_hitters(
    events_stream: DataFrame, item_col: str = "user_id", m: int = 8
) -> DataFrame:
    """Continuous per-key heavy hitters with BOUNDED state: an
    ``m``-counter Misra-Gries summary per ``event_type``, emitted in
    update mode each micro-batch.

    The state is O(m) per group regardless of how many distinct items
    stream through — the property that makes this viable where a full
    (key, item) count table would be state-unbounded. Classic MG
    guarantees hold per group: ``true - n/m ≤ est ≤ true`` for every
    item, so any item with true frequency > n/m is guaranteed present
    in the summary, and with ``m ≥`` distinct items the counts are
    exact (both pinned in tests/test_streaming_state.py). Counters fold
    batch-aggregated observations in (count DESC, item ASC) order, so
    the result is a deterministic function of the micro-batch sequence.

    NULL items (absent ``item_col`` values, or non-numeric values the
    bigint cast nulls out) are filtered EXPLICITLY before the stateful
    fold, and ``n_seen`` counts non-null items only (ADVICE r07 low:
    pandas groupby would have dropped them silently AFTER n_seen was
    advanced in spirit — the documented ``true - n/m ≤ est`` guarantee
    must be stated against the n the counters actually folded).
    """
    keyed = events_stream.select(
        "event_type", F.col(item_col).cast("bigint").alias("item")
    ).filter(F.col("item").isNotNull())
    return keyed.groupBy("event_type").applyInPandasWithState(
        make_mg_update(m),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- HyperLogLog distinct count per key-group -------------------------------

HLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("est", DoubleType()),
        StructField("v_zeros", LongType()),
        StructField("s41", LongType()),
    ]
)

HLL_STATE_SCHEMA = StructType(
    [
        StructField("regs", StringType()),  # csv of 256 register values (0..41)
    ]
)


def _hll_hash(item: int) -> tuple[int, int]:
    """(register index, rank) for one item — the EXACT batch split
    (functions/sketch.hll_registers): portable md5 over 's{seed}:{item}',
    j = h mod 256, rank = 41 - bit_length(h div 256)."""
    import hashlib

    from ..functions.sketch import HLL_M, HLL_SEED

    h = int(hashlib.md5(f"s{HLL_SEED}:{item}".encode()).hexdigest()[:12], 16)
    wq = h // HLL_M
    return h % HLL_M, (41 if wq == 0 else 41 - wq.bit_length())


def _hll_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    from ..functions.portable_ln import py_grid_nanos, py_ln_int
    from ..functions.sketch import HLL_M, _hll_alpha

    (event_type,) = key
    regs = (
        [int(x) for x in state.get[0].split(",")] if state.exists else [0] * HLL_M
    )
    for pdf in pdfs:
        # registers are max-folds over the item SET: dedupe the batch
        # first so the per-item Python hash runs once per distinct item
        for item in pdf["item"].drop_duplicates():
            j, r = _hll_hash(int(item))
            if r > regs[j]:
                regs[j] = r
    state.update((",".join(str(r) for r in regs),))
    # the batch estimator, verbatim (functions/sketch.hll_distinct)
    s41 = sum(1 << (41 - r) for r in regs)
    v = sum(1 for r in regs if r == 0)
    raw = ((_hll_alpha() * 65536.0) * 2199023255552.0) / float(s41)
    if v > 0 and raw <= 640.0:
        est = 256.0 * (py_ln_int(HLL_M) - py_ln_int(v))
    else:
        est = raw
    est4 = float(py_grid_nanos(est, 4)) / 10000.0
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "est": [est4],
            "v_zeros": [v],
            "s41": [s41],
        }
    )


def streaming_distinct_hll(
    events_stream: DataFrame, item_col: str = "user_id"
) -> DataFrame:
    """Continuous per-key distinct-count estimate with BOUNDED state:
    a 256-register HyperLogLog per ``event_type``, emitted in update
    mode each micro-batch.

    State is O(m) integers per group regardless of how many distinct
    items stream through — the streaming twin of the exact-but-
    state-unbounded dropDuplicates/approx pattern. Registers fold by
    elementwise max, so the summary after ANY micro-batch partitioning
    of the stream equals the batch sketch over the union of the data
    seen so far (pinned exactly in tests/test_streaming_state.py) —
    order- and replay-insensitive by construction. The estimate is the
    batch estimator verbatim: exact integer harmonic sum + the portable
    libm-free ln chain (functions/portable_ln).

    NULL items are filtered explicitly before the stateful fold, like
    streaming_heavy_hitters.
    """
    keyed = events_stream.select(
        "event_type", F.col(item_col).cast("bigint").alias("item")
    ).filter(F.col("item").isNotNull())
    return keyed.groupBy("event_type").applyInPandasWithState(
        _hll_update,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
