"""Sketch-typed aggregates: Presto's approximate/mergeable functions.

Reference surface (presto-main-base/.../operator/aggregation/ +
operator/scalar/):

* ``approx_set`` / ``merge`` / ``cardinality`` over HYPERLOGLOG values
  (ApproximateSetAggregation.java, MergeHyperLogLogAggregation.java,
  HyperLogLogFunctions.java) — the two-level pattern behind mergeable
  rollups: partial sketches per fine-grained group, merged upward
  without rescanning the raw data.
* ``approx_distinct`` (ApproximateCountDistinctAggregation.java:41).
* ``approx_percentile`` (qdigest/tdigest-backed).
* ``approx_most_frequent`` (approxmostfrequent/ApproximateMostFrequent*).
* ``numeric_histogram`` (NumericHistogramAggregation area).

Spark mappings stay JVM-side: Spark 3.5+ ships Apache DataSketches HLL
(`hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`) — real
mergeable sketch values (BinaryType payload), the exact analog of
Presto's HYPERLOGLOG column type.  Sketch *bytes* differ between
engines (DataSketches vs Airlift), so cross-engine tests assert the
error envelope, never the payload — the reference's own test strategy
(TestApproximateCountDistinctAggregation.java asserts bounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---- HYPERLOGLOG value functions (approx_set / merge / cardinality) ----

def approx_set(col: Column | str, lg_k: int = 14) -> Column:
    """approx_set(x) → HLL sketch value (ApproximateSetAggregation.java).

    Returns a mergeable BinaryType sketch — store it per fine-grained
    group (e.g. per day+dim), then roll up with merge_hll without
    touching raw rows again: the pattern that makes 100 TB distinct
    counting incremental.  lg_k=14 (16 KB registers) keeps relative
    error ~0.8% so union re-estimation stays inside the 5% envelope at
    any cardinality; Presto's default HLL is the same order (4 KB).
    """
    return F.hll_sketch_agg(col, F.lit(lg_k))


def merge_hll(sketch_col: Column | str) -> Column:
    """merge(hll) → merged sketch (MergeHyperLogLogAggregation.java)."""
    return F.hll_union_agg(sketch_col)


def hll_cardinality(sketch_col: Column | str) -> Column:
    """cardinality(hll) → BIGINT estimate (HyperLogLogFunctions.java)."""
    return F.hll_sketch_estimate(sketch_col)


def approx_distinct(col: Column | str, rsd: float = 0.023) -> Column:
    """approx_distinct(x) (ApproximateCountDistinctAggregation.java:41).

    Default rsd mirrors Presto's default standard error of 2.3%.
    """
    return F.approx_count_distinct(col, rsd)


# ---- approximate percentiles ----

def approx_percentile(col: Column | str, fraction, accuracy: int = 10000) -> Column:
    """approx_percentile(x, p) (ApproximateLongPercentileAggregations.java).

    Spark's percentile_approx uses KLL-like quantile summaries —
    mergeable across partitions like Presto's qdigest.
    """
    return F.percentile_approx(col, fraction, accuracy)


# ---- approx_most_frequent ----

def approx_most_frequent(
    df: DataFrame, group_cols: list[str], value_col: str, k: int
) -> DataFrame:
    """approx_most_frequent(k, x, capacity) (approxmostfrequent/).

    Spark has no space-saving sketch; the scalable spelling is a
    two-level aggregation: count per (group, value) with map-side
    partial aggregation, then per-group top-k via sorted-struct slice —
    one shuffle on (group, value), one on group.  Exact, deterministic
    (count desc, value asc tie-break), and shuffle-bounded by distinct
    value count — at 100 TB this is the plan a space-saving sketch
    would approximate.  Returns (group..., freq MAP<value, BIGINT>).
    """
    counted = (
        df.groupBy(*group_cols, F.col(value_col).alias("__v"))
        .agg(F.count("*").alias("__n"))
    )
    entry = F.struct(
        (-F.col("__n")).alias("neg_n"), F.col("__v").alias("v"), F.col("__n").alias("n")
    )
    return (
        counted.groupBy(*group_cols)
        .agg(F.collect_list(entry).alias("__entries"))
        .select(
            *group_cols,
            F.map_from_entries(
                F.transform(
                    F.slice(F.array_sort("__entries"), 1, k),
                    lambda e: F.struct(e["v"].alias("key"), e["n"].alias("value")),
                )
            ).alias("freq"),
        )
    )


# ---- numeric_histogram ----

def numeric_histogram(
    df: DataFrame, group_cols: list[str], value_col: str,
    buckets: int, lo: float, hi: float,
) -> DataFrame:
    """numeric_histogram(buckets, x) with fixed bounds.

    Presto's version adapts bucket boundaries per group (streaming
    merge); with known bounds the scalable equivalent is width_bucket +
    count groupBy — pure map-side bucketing, one shuffle.  Returns
    (group..., bucket, lo_edge, hi_edge, n).
    """
    w = (hi - lo) / buckets
    b = F.width_bucket(F.col(value_col), F.lit(lo), F.lit(hi), F.lit(buckets))
    return (
        df.groupBy(*group_cols, b.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .withColumn("lo_edge", F.lit(lo) + (F.col("bucket") - 1) * F.lit(w))
        .withColumn("hi_edge", F.lit(lo) + F.col("bucket") * F.lit(w))
    )
