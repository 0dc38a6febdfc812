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
