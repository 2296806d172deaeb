"""Custom stateful streaming operators via applyInPandasWithState.

Presto has no streaming at all (SURVEY §2.10); this is the engine's
Spark-native extension for operators that windowed aggregation cannot
express — arbitrary per-key state machines (running aggregates with
custom eviction, CDC-style change tracking, per-entity anomaly
counters).  State lives in Spark's state store (RocksDB-backed on a
real cluster, checkpointed, watermark-evicted via timeouts), so the
operator scales horizontally by key hash exactly like a shuffle.

The Python hook is Arrow-batched (one pandas DataFrame per key-batch),
not per-row — the only acceptable Python shape in a hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

RUNNING_STATS_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

RUNNING_STATS_STATE = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def _update_running_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum) state machine.

    Merges each incoming Arrow batch into the persisted state and emits
    the updated running totals — the minimal custom stateful operator
    shape (swap the update rule for sessionization, CDC folding, etc.).
    """
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(stream_df: DataFrame) -> DataFrame:
    """(user_id, n_events, total_value) updated per micro-batch.

    Input must be a streaming DataFrame with (user_id, value) columns.
    NoTimeout here; production sessionization would use
    EventTimeTimeout + state.setTimeoutTimestamp to evict idle keys —
    the state-size bound an unbounded stream needs.
    """
    return (
        stream_df.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_stats,
            outputStructType=RUNNING_STATS_OUTPUT,
            stateStructType=RUNNING_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
