"""Unit tests for sketch aggregates (operators/sketches.py).

Mirrors the reference's bound-asserting strategy
(TestApproximateCountDistinctAggregation.java) — envelopes for
approximate values, exact checks for deterministic compositions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_spark.operators import sketches as S


def test_hll_merge_equals_direct(spark):
    """Merging per-group partial sketches must equal sketching the whole
    column directly — the mergeability contract."""
    df = spark.range(10000).withColumn("g", F.col("id") % 7)
    merged = (
        df.groupBy("g")
        .agg(S.approx_set("id").alias("s"))
        .agg(S.hll_cardinality(S.merge_hll("s")).alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        df.agg(S.hll_cardinality(S.approx_set("id")).alias("est"))
        .collect()[0]
        .est
    )
    # Union re-estimates from merged registers — close to, not always
    # bit-equal to, the direct sketch once past sparse mode.
    assert abs(merged - direct) <= 0.01 * direct
    assert abs(merged - 10000) <= 0.05 * 10000


def test_approx_distinct_envelope(spark):
    df = spark.range(50000)
    est = df.agg(S.approx_distinct("id").alias("e")).collect()[0].e
    assert abs(est - 50000) <= 0.05 * 50000


def test_approx_most_frequent_exact_order(spark):
    rows = [("a", v) for v in [1] * 5 + [2] * 3 + [3] * 3 + [4]]
    df = spark.createDataFrame(rows, "g string, v int")
    (out,) = S.approx_most_frequent(df, ["g"], "v", 2).collect()
    # top-2 by count desc; tie (2 and 3, both 3x) broken by value asc.
    assert list(out.freq.items()) == [(1, 5), (2, 3)]


def test_numeric_histogram_buckets(spark):
    df = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    out = {r.bucket: r.n for r in S.numeric_histogram(df, [], "v", 5, 0.0, 10.0).collect()}
    assert out == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}


def test_approx_percentile_close(spark):
    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    est = df.agg(S.approx_percentile("v", 0.5).alias("p")).collect()[0].p
    assert 450 <= est <= 550
