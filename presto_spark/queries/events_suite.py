"""Event-time windowing queries (streaming-extension semantics in batch).

The same expressions run under Structured Streaming
(tests/test_streaming.py proves batch/stream equivalence with an
AvailableNow drain); here they run in batch so the DuckDB oracle can
check the arithmetic.
"""

from pyspark.sql import functions as F

from presto_spark.queries.base import prepare, register
from presto_spark.streaming import windows


@register(
    "event_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS win_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Tumbling 1h event-time windows (streaming/windows.py tumbling; "
        "Spark F.window). Presto has no event-time windowing (SURVEY "
        "§2.10) — Spark-native extension.",
    tags=("events", "streaming", "bench"),
)
def event_tumbling_window(spark, sf_dir):
    prepare(spark, sf_dir)
    ev = spark.table("events")
    return (
        windows.tumbling(ev, "ts", "1 hour", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("win_start"),
            "event_type", "n", "total_value",
        )
        .orderBy("win_start", "event_type")
    )


@register(
    "event_sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT unnest([time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)),
                     time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) - INTERVAL 30 MINUTE])
               AS win_start,
             value
      FROM events
    )
    SELECT win_start, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM buckets
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Sliding windows (1h long, 30m slide): each event lands in two "
        "buckets (streaming/windows.py sliding). Oracle replicates the "
        "bucket expansion with unnest.",
    tags=("events", "streaming"),
)
def event_sliding_window(spark, sf_dir):
    prepare(spark, sf_dir)
    ev = spark.table("events")
    return (
        windows.sliding(ev, "ts", "1 hour", "30 minutes")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("win_start"),
            "n", "total_value",
        )
        .orderBy("win_start")
    )


@register(
    "event_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, epoch_ns(ts) AS tsn,
             CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
                       OVER (PARTITION BY user_id ORDER BY epoch_ns(ts))
                  > 1800 * 1000000000::BIGINT OR
                  lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts))
                  IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, tsn,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY tsn
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM ordered
    )
    SELECT user_id, count(DISTINCT session_id) AS n_sessions,
           max(cnt) AS largest_session
    FROM (SELECT user_id, session_id, count(*) AS cnt
          FROM sessions GROUP BY 1, 2) s
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Session windows, 30min gap (streaming/windows.py session; Spark "
        "session_window merging state machine). Oracle derives the same "
        "sessions via gaps-and-islands over nanosecond timestamps; "
        "microsecond truncation cannot split/merge a session because gap "
        "boundaries at exactly 30min would need sub-µs alignment.",
    tags=("events", "streaming"),
)
def event_session_window(spark, sf_dir):
    prepare(spark, sf_dir)
    ev = spark.table("events")
    per_session = (
        windows.session(ev, "ts", "30 minutes", "user_id")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("cnt").alias("largest_session"),
        )
        .orderBy("user_id")
    )


@register(
    "event_json_enrichment",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50)
             AS k_big,
           CAST(min(value) AS DOUBLE) AS min_value,
           CAST(max(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Typical event-pipeline enrichment: JSON property extraction + "
        "conditional aggregation over the stream table.",
    tags=("events",),
)
def event_json_enrichment(spark, sf_dir):
    prepare(spark, sf_dir)
    ev = spark.table("events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("bigint").alias("k_sum"),
            F.count_if(k > 50).alias("k_big"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
        )
        .orderBy("event_type")
    )


@register(
    "event_funnel_conversion",
    oracle="""
    WITH stage AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_buy
      FROM events GROUP BY user_id
    )
    SELECT
      count(*) AS n_users,
      count(*) FILTER (WHERE t_view IS NOT NULL) AS n_viewed,
      count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view) AS n_clicked,
      count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                         AND t_buy > t_click) AS n_converted
    FROM stage
    """,
    doc="Ordered funnel (view -> click -> purchase): min-timestamp per "
        "stage per user, sequenced by comparison — one shuffle on "
        "user_id regardless of corpus size. Classic event-analytics "
        "shape Presto serves via min_by/filters.",
    tags=("events", "bench"),
)
def event_funnel_conversion(spark, sf_dir):
    prepare(spark, sf_dir)
    ev = spark.table("events")
    ns = F.col("ts_ns")
    stage = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", ns)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", ns)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", ns)).alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    converted = clicked & (F.col("t_buy") > F.col("t_click"))
    return stage.agg(
        F.count("*").alias("n_users"),
        F.count_if(viewed).alias("n_viewed"),
        F.count_if(clicked).alias("n_clicked"),
        F.count_if(converted).alias("n_converted"),
    )


@register(
    "event_daily_retention",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    )
    SELECT a.d AS day0, count(DISTINCT a.user_id) AS active,
           count(DISTINCT b.user_id) AS retained_next_day
    FROM activity a LEFT JOIN activity b
      ON a.user_id = b.user_id AND b.d = a.d + INTERVAL 1 DAY
    GROUP BY a.d
    ORDER BY a.d
    """,
    doc="Next-day retention: distinct active users per day self-joined "
        "on (user, day+1). Shuffles only (user_id, date) pairs — the "
        "cohort-analysis shape at any scale.",
    tags=("events", "bench"),
)
def event_daily_retention(spark, sf_dir):
    prepare(spark, sf_dir)
    ev = spark.table("events")
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    a, b = activity.alias("a"), activity.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.d") == F.date_add(F.col("a.d"), 1)),
            "left",
        )
        .groupBy(F.col("a.d").alias("day0"))
        .agg(
            F.countDistinct(F.col("a.user_id")).alias("active"),
            F.countDistinct(F.col("b.user_id")).alias("retained_next_day"),
        )
        .orderBy("day0")
    )


@register(
    "event_sessionization_sql",
    oracle="""
    WITH ordered AS (
      SELECT user_id, epoch_ns(ts) AS tsn,
             CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
                       OVER (PARTITION BY user_id ORDER BY epoch_ns(ts))
                  > 1800 * 1000000000::BIGINT
                  OR lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                                             ORDER BY epoch_ns(ts)) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE user_id < 50
    ),
    numbered AS (
      SELECT user_id, tsn,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY tsn
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           count(*) AS n_events,
           CAST((max(tsn) - min(tsn)) // 1000000000 AS BIGINT) AS duration_s
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
    doc="Gaps-and-islands sessionization in pure SQL (lag + running sum "
        "of session starts) — the batch equivalent of the "
        "session_window operator, exercising WindowOperator.java "
        "semantics end-to-end with a 30min gap.",
    tags=("events", "window"),
)
def event_sessionization_sql(spark, sf_dir):
    prepare(spark, sf_dir)
    from pyspark.sql import Window as W

    ev = spark.table("events").where(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts_ns")
    gap_ns = 1800 * 1_000_000_000
    ordered = ev.select(
        "user_id", "ts_ns",
        F.when(
            (F.col("ts_ns") - F.lag("ts_ns").over(w) > gap_ns)
            | F.lag("ts_ns").over(w).isNull(),
            1,
        ).otherwise(0).alias("is_new"),
    )
    numbered = ordered.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.floor((F.max("ts_ns") - F.min("ts_ns")) / 1_000_000_000)
            .cast("bigint").alias("duration_s"),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "event_stream_stateful_stats",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events WHERE user_id < 25
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Custom stateful streaming operator (streaming/stateful.py "
        "running_user_stats, applyInPandasWithState): the events file "
        "is drained as a stream with Trigger.AvailableNow, per-key "
        "state accumulates (count, sum), and the final state must equal "
        "the batch aggregation — the oracle. Exercises Spark's state "
        "store through the driver's correctness gate.",
    tags=("events", "streaming"),
)
def event_stream_stateful_stats(spark, sf_dir):
    import os
    import tempfile

    prepare(spark, sf_dir)
    from presto_spark.streaming import stateful

    # File stream source needs a directory; stage a symlink.
    d = tempfile.mkdtemp(prefix="presto_spark_stream_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(schema).parquet(d)
        .where(F.col("user_id") < 25)
        .withColumn(
            "value", F.col("value").cast("decimal(12,2)").cast("double")
        )
    )
    out = stateful.running_user_stats(stream)
    qname = "stateful_stats_" + os.path.basename(d).split("_")[-1]
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    q.stop()
    return (
        spark.table(qname)
        .select(
            "user_id", "n_events",
            F.col("total_value").cast("decimal(12,2)").cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id")
    )


@register(
    "event_stream_interval_join",
    oracle="""
    SELECT v.user_id AS user_id,
           count(*) AS n_pairs,
           CAST(sum(CAST(c.value AS DECIMAL(12,2))) AS DOUBLE) AS click_value
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
    WHERE v.event_type = 'view' AND c.event_type = 'click'
      AND v.user_id < 40
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
    doc="Stream-stream interval join (streaming/joins.py interval_join — "
        "Spark-native extension, Presto has none, SURVEY §2.10): view "
        "and click events drained as TWO file streams, watermarked both "
        "sides, joined on user within [view_ts, view_ts + 30min]; "
        "grouped pair counts must equal the batch self-join — the "
        "DuckDB oracle. State is evictable because the interval bounds "
        "what can still match.",
    tags=("events", "streaming"),
)
def event_stream_interval_join(spark, sf_dir):
    import os
    import tempfile

    prepare(spark, sf_dir)
    from presto_spark.streaming import joins, windows

    d = tempfile.mkdtemp(prefix="presto_spark_sj_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema

    views = (
        windows.stream_events(spark, d, raw_schema, watermark=None)
        .where((F.col("event_type") == "view") & (F.col("user_id") < 40))
        .select("user_id", F.col("ts").alias("l_ts"))
    )
    clicks = (
        windows.stream_events(spark, d, raw_schema, watermark=None)
        .where((F.col("event_type") == "click") & (F.col("user_id") < 40))
        .select("user_id", F.col("ts").alias("r_ts"),
                F.col("value").alias("click_v"))
    )
    joined = joins.interval_join(
        views, clicks, "user_id", "l_ts", "r_ts", interval="30 minutes"
    )
    qname = "sj_" + os.path.basename(d).split("_")[-1]
    q = (
        joined.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    q.stop()
    return (
        spark.table(qname)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("click_v").cast("decimal(12,2)"))
            .cast("double").alias("click_value"),
        )
        .orderBy("user_id")
    )


@register(
    "event_asof_join_enrichment",
    # DuckDB has a native ASOF JOIN — the ideal independent oracle for
    # the union-marker implementation (operators/asof.py).
    oracle="""
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
         errs AS (SELECT user_id, ts, value FROM events
                  WHERE event_type = 'error')
    SELECT c.event_id, c.user_id,
           CAST(c.value AS DOUBLE) AS click_value,
           CAST(e.value AS DOUBLE) AS last_error_value
    FROM clicks c
    ASOF LEFT JOIN errs e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    ORDER BY c.event_id
    """,
    doc="As-of join (operators/asof.py — union-marker + keyed window, "
        "one shuffle, no range-join blowup): every click event enriched "
        "with the most recent prior error value for the same user; "
        "oracle is DuckDB's native ASOF LEFT JOIN. Left rows with no "
        "prior error keep NULL.",
    tags=("events", "asof"),
)
def event_asof_join_enrichment(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators.asof import asof_join

    ev = spark.table("events")
    clicks = ev.where(F.col("event_type") == "click")
    errs = (ev.where(F.col("event_type") == "error")
            .select("user_id", "ts",
                    F.col("value").alias("last_error_value")))
    joined = asof_join(
        clicks, errs, time_col="ts", by=("user_id",),
        value_cols=("last_error_value",))
    return joined.select(
        "event_id", "user_id",
        F.col("value").cast("double").alias("click_value"),
        F.col("last_error_value").cast("double").alias("last_error_value"),
    ).orderBy("event_id")


@register(
    "event_range_join_attribution",
    # Oracle: the naive BETWEEN join — DuckDB plans it as an IEJoin,
    # exactly the quadratic shape the binned operator avoids.
    oracle="""
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         wnd AS (SELECT event_id AS err_id, user_id, ts AS err_ts,
                        ts + INTERVAL 30 MINUTE AS err_end
                 FROM events WHERE event_type = 'error')
    SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_attributed,
           CAST(count(DISTINCT c.event_id) AS BIGINT) AS n_clicks,
           CAST(count(DISTINCT w.err_id) AS BIGINT) AS n_errors
    FROM clicks c JOIN wnd w
      ON c.user_id = w.user_id AND c.ts BETWEEN w.err_ts AND w.err_end
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
    doc="Binned range join (operators/range_join.py): clicks attributed "
        "to every error window [err_ts, err_ts+30min] of the same user. "
        "Intervals explode to overlapped hour bins, points land in one "
        "bin, equi-join on (user, bin) + exact BETWEEN filter — a hash "
        "shuffle instead of the nested-loop plan a raw range predicate "
        "gets. Oracle is the naive BETWEEN join in DuckDB.",
    tags=("events", "rangejoin"),
)
def event_range_join_attribution(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators.range_join import range_join

    ev = spark.table("events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    wnd = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id",
        F.col("ts").alias("err_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("err_end"))
    joined = range_join(
        clicks, wnd, point_ts="ts", start_col="err_ts", end_col="err_end",
        by=("user_id",), bin_width_seconds=3600.0)
    return (joined.groupBy("user_id")
            .agg(F.count("*").alias("n_attributed"),
                 F.countDistinct("event_id").alias("n_clicks"),
                 F.countDistinct("err_id").alias("n_errors"))
            .orderBy("user_id"))


@register(
    "event_stream_dedup",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows_after_dedup,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_unique
    FROM events WHERE user_id < 25
    """,
    doc="Streaming exact dedup (dropDuplicatesWithinWatermark): the "
        "source directory stages the SAME events file twice, so every "
        "row arrives as a duplicate; watermark-scoped dedup state "
        "collapses them back to the batch-distinct row set. This is the "
        "streaming tier of the exact-dedup story (llm/dedup.py) — state "
        "is bounded by the watermark horizon instead of the corpus, the "
        "property that makes it run forever at ingest scale.",
    tags=("events", "streaming", "dedup"),
)
def event_stream_dedup(spark, sf_dir):
    import os
    import tempfile

    prepare(spark, sf_dir)
    from pyspark.sql.types import LongType

    d = tempfile.mkdtemp(prefix="presto_spark_dedup_stream_")
    src = os.path.join(sf_dir, "events.parquet")
    os.symlink(src, os.path.join(d, "events_a.parquet"))
    os.symlink(src, os.path.join(d, "events_b.parquet"))
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema).parquet(d)
              .where(F.col("user_id") < 25))
    # events.ts arrives as BIGINT nanos (legacy.parquet.nanosAsLong) or
    # native timestamp depending on writer — same robustness as
    # sources/catalog.py.
    if isinstance(schema["ts"].dataType, LongType):
        ts = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    else:
        ts = F.col("ts").cast("timestamp")
    deduped = (stream.withColumn("ts_event", ts)
               .withWatermark("ts_event", "90 days")
               .dropDuplicatesWithinWatermark(["event_id"]))
    qname = "stream_dedup_" + os.path.basename(d).split("_")[-1]
    q = (deduped.writeStream.format("memory").queryName(qname)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    q.stop()
    return spark.table(qname).agg(
        F.count("*").alias("n_rows_after_dedup"),
        F.countDistinct("event_id").alias("n_unique"),
    )
