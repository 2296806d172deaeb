"""Event-time windowing — the engine's streaming extension.

Presto has no streaming operators at all (SURVEY.md §2.10: no
watermarks, no event-time windows anywhere in
presto-main-base/.../operator/; the Kafka connector reads topics as
static tables).  This module is therefore a Spark-native *extension*,
not reference parity: the same windowing expressions work in batch
(over the events table) and in Structured Streaming (over readStream
sources) — one definition, two execution modes, which is exactly how
Spark unifies the two.

Scale notes: tumbling/sliding windows shuffle on (window, keys) — add
the window column *before* the shuffle so AQE sizes partitions on the
true key distribution.  Session windows use Spark's native
session_window (merging state machine, watermark-evictable in
streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame, ts_col: str, duration: str, *keys: str
) -> DataFrame:
    """Tumbling event-time windows: one bucket per duration."""
    return df.groupBy(F.window(F.col(ts_col), duration).alias("win"), *keys)


def sliding(
    df: DataFrame, ts_col: str, duration: str, slide: str, *keys: str
) -> DataFrame:
    """Sliding windows: duration-long buckets every `slide`."""
    return df.groupBy(
        F.window(F.col(ts_col), duration, slide).alias("win"), *keys
    )


def session(
    df: DataFrame, ts_col: str, gap: str, *keys: str
) -> DataFrame:
    """Session windows: events within `gap` of each other merge."""
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("win"), *keys
    )


def stream_events(
    spark, source_dir: str, schema, watermark: str | None = "10 minutes",
    ts_col: str = "ts",
):
    """File-source stream with a watermark — the streaming entry point.

    In production this is a Kafka source; the file source has identical
    semantics for windowed aggregation + late-data handling.  Watermark
    bounds state: windows older than (max event time - watermark) are
    finalized and evicted — mandatory for unbounded streams.

    The driver's events.parquet carries TIMESTAMP(NANOS), surfaced as
    BIGINT nanos under the session's nanosAsLong setting — convert to a
    µs timestamp before the watermark, mirroring sources/catalog.py.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    ts_type = dict(stream.dtypes)[ts_col]
    if ts_type == "bigint":
        stream = stream.withColumn(
            ts_col,
            F.timestamp_micros(F.floor(F.col(ts_col) / F.lit(1000)).cast("long")),
        )
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE);
        # session tz is UTC so the cast is value-preserving.
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    # watermark=None: caller applies its own (e.g. joins.interval_join
    # watermarks each side's renamed ts — Spark forbids redefinition).
    if watermark is None:
        return stream
    return stream.withWatermark(ts_col, watermark)


def run_to_memory_sink(stream_df: DataFrame, query_name: str):
    """Drain a stream with Trigger.AvailableNow into an in-memory table.

    AvailableNow processes everything currently in the source then
    stops — deterministic, so streaming results can be compared against
    the batch run of the same expression (done in tests/test_streaming.py).
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
