"""Batch/stream equivalence for the event-time windowing extension.

The same windowing expression (streaming/windows.py) is run (a) in batch
over the events parquet and (b) as a Structured Streaming query with
Trigger.AvailableNow draining the same files — results must match.
This is the determinism contract that makes the streaming extension
testable (Presto itself has no streaming operators, SURVEY.md §2.10).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_spark.streaming import windows
from tests.conftest import SF_DIR


def _window_agg(grouped):
    return grouped.agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("total_value"),
    ).select(
        F.col("win.start").alias("win_start"),
        "event_type",
        "n",
        "total_value",
    )


@pytest.fixture(scope="module")
def events_schema(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").schema


def test_tumbling_batch_equals_stream(spark, events_schema, tmp_path):
    from presto_spark.sources.catalog import load_table

    # The file stream source requires a directory; stage the driver's
    # single parquet file behind a symlink (read-only testdata).
    (tmp_path / "events.parquet").symlink_to(f"{SF_DIR}/events.parquet")

    batch = load_table(spark, SF_DIR, "events")
    expected = {
        tuple(r)
        for r in _window_agg(
            windows.tumbling(batch, "ts", "1 hour", "event_type")
        ).collect()
    }

    stream = windows.stream_events(
        spark, str(tmp_path), events_schema, watermark="10 minutes"
    )
    q = windows.run_to_memory_sink(
        _window_agg(windows.tumbling(stream, "ts", "1 hour", "event_type")),
        "tumbling_equiv",
    )
    got = {tuple(r) for r in spark.table("tumbling_equiv").collect()}
    q.stop()
    assert got == expected


def test_session_window_merges_within_gap(spark):
    df = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:00:00"),
            ("u1", "2024-01-01 00:10:00"),  # same session (10m < 30m gap)
            ("u1", "2024-01-01 01:00:00"),  # new session (50m > 30m gap)
            ("u2", "2024-01-01 00:00:00"),
        ],
        "user_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = (
        windows.session(df, "ts", "30 minutes", "user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.cnt)
    assert sorted(per_user["u1"]) == [1, 2]
    assert per_user["u2"] == [1]


def test_watermark_present_in_stream_plan(spark, events_schema):
    stream = windows.stream_events(
        spark, f"{SF_DIR}/events.parquet", events_schema, watermark="15 minutes"
    )
    assert stream.isStreaming
    # Watermark node must be in the logical plan — it is what bounds
    # state for unbounded sources.
    assert "EventTimeWatermark" in stream._jdf.queryExecution().logical().toString()


def test_stateful_running_stats_matches_batch(spark, events_schema, tmp_path):
    """applyInPandasWithState custom operator: after draining the whole
    file source, per-user state must equal the batch groupBy."""
    from presto_spark.streaming import stateful

    (tmp_path / "events.parquet").symlink_to(f"{SF_DIR}/events.parquet")
    stream = (
        spark.readStream.schema(events_schema)
        .parquet(str(tmp_path))
        .where(F.col("user_id") < 10)
    )
    out = stateful.running_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    # "update" mode re-emits a row per micro-batch; the last emit per
    # user is the final state (single batch here, so rows are final).
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.table("running_stats").collect()
    }
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").where(F.col("user_id") < 10)
    expected = {
        r.user_id: (r.n, round(r.t, 6))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == expected


def test_interval_join_stream_matches_batch(spark):
    """Stream-stream interval join drained with AvailableNow equals the
    batch run of the same interval_join expression (streaming/joins.py)."""
    import os
    import tempfile

    from presto_spark.streaming import joins, windows

    sf_dir = SF_DIR
    d = tempfile.mkdtemp(prefix="ps_sj_test_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema

    def sides(src):
        v = src.where(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("l_ts"))
        c = src.where(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("r_ts"))
        return v, c

    sv, sc = sides(windows.stream_events(spark, d, raw_schema, watermark=None))
    stream_out = joins.interval_join(sv, sc, "user_id", "l_ts", "r_ts",
                                     interval="15 minutes")
    qname = "sj_eq_" + os.path.basename(d).split("_")[-1]
    q = (stream_out.writeStream.format("memory").queryName(qname)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    q.stop()
    got = sorted(map(tuple, spark.table(qname).collect()))

    batch = spark.read.parquet(os.path.join(d, "events.parquet"))
    if dict(batch.dtypes)["ts"] == "bigint":
        batch = batch.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    bv, bc = sides(batch)
    want = sorted(map(tuple, joins.interval_join(
        bv, bc, "user_id", "l_ts", "r_ts", interval="15 minutes").collect()))
    assert got == want and len(want) > 0


def test_stream_exact_dedup_matches_batch_distinct(spark, tmp_path):
    """streaming/dedup.py: draining a document stream through
    dropDuplicatesWithinWatermark leaves exactly one row per content
    digest — the same digest set the batch exact_dedup pass keeps —
    and the plan carries the dedup-within-watermark state operator."""
    from presto_spark.streaming import dedup as sdedup

    (tmp_path / "documents.parquet").symlink_to(
        f"{SF_DIR}/documents.parquet")
    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(tmp_path))
        .select("doc_id", "text")
        # +1 day: Spark's INITIAL watermark is epoch 0, and a row whose
        # event time equals the watermark is dropped as late — doc 0
        # at timestamp_seconds(0) would silently vanish
        .withColumn(
            "ts", F.timestamp_seconds(F.col("doc_id") + 86400))
    )
    out = sdedup.stream_exact_dedup(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    got = spark.table("stream_dedup").collect()
    digests = [r.digest for r in got]
    assert len(digests) == len(set(digests))  # one row per digest
    batch = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.md5("text").alias("digest")).distinct()
    )
    assert set(digests) == {r.digest for r in batch.collect()}
