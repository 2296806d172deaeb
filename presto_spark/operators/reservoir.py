"""reservoir_sample and differential_entropy aggregates.

Reference surface:

* ``reservoir_sample(initial_state, initial_count, x, k)`` →
  row(processed_count bigint, sample array(T)) —
  presto-main-base/.../operator/aggregation/reservoirsample/
  ReservoirSampleFunction.java:40-110 (fixed-size uniform sample,
  mergeable across partials).
* ``differential_entropy(sample_size, x)`` — reservoir + Vasicek
  spacing estimator (differentialentropy/
  UnweightedReservoirSampleStateStrategy.java;
  EntropyCalculations.java:28-45, the Alizadeh-Noughabi/Arghami
  variant); docs functions/aggregate.rst:1485-1540.
* ``differential_entropy(bucket_count, x, weight, method, min, max)``
  with method 'fixed_histogram_mle' | 'fixed_histogram_jacknife' —
  FixedHistogramMleStateStrategy.java /
  FixedHistogramJacknifeStateStrategy.java:60-144;
  EntropyCalculations.java:47-51 (H = max((ln(width·ΣW) −
  Σ(w·ln w)/ΣW)/ln 2, 0)); bucket index convention
  FixedHistogramUtils.java:28-37 (min(⌊B·(x−min)/(max−min)⌋, B−1)).

Spark-first design — all three are compositions of built-in Column
expressions (no UDFs):

* The reservoir is selected by ranking rows on an xxhash64 of
  (seed, value, physical row id) and keeping the k smallest — a
  uniform without-replacement sample whose *distribution* matches the
  reference's Vitter reservoir (any fixed-size uniform sample does).
  The row id (``monotonically_increasing_id``) gives every copy of a
  repeated value its own priority, so duplicates are sampled
  proportionally — without the per-value window the old duplicate
  index needed.  Determinism is law-level, not byte-level: the sample
  is reproducible for a fixed seed, input, and physical partitioning,
  but row ids depend on partition layout, so a different layout (or a
  speculative rerun racing a shuffle-order change) can select a
  different — equally uniform — sample.  The reference's
  ThreadLocalRandom reservoir has exactly the same property, which is
  why the differential tests assert membership/size/distribution, not
  contents (the reference's own TestReservoirSampleAggregation
  strategy).
* Selection is two-level bottom-k (operators/_bottomk.py): each input
  partition picks its own k smallest per group, the final rank sees
  ≤ partitions×k rows — no task ever sorts a whole group, so a global
  sample of a 100 TB table never funnels into one reducer.
* Vasicek entropy folds over the per-group sorted sample array —
  state is capped at ``sample_size`` elements by construction, so
  collecting the reservoir per group is bounded regardless of input
  scale (the whole point of the reservoir).  When ``sample_size ≥ n``
  the estimate is deterministic (the sample is the data) and DuckDB
  replays the spacing formula exactly.
* The fixed-histogram strategies shuffle only (group, bucket[,
  weight]) partial rows — map-side combine applies, state is priced
  in bucket_count, not data size: the 100 TB-safe shape.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presto_spark.operators._bottomk import bottom_k_rank

_LN2 = math.log(2.0)


def reservoir_sample(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Fixed-size uniform sample per group (ReservoirSampleFunction.java).

    Returns ``group_cols + [processed_count, sample]`` mirroring the
    reference's ``row(processed_count bigint, sample array(T))``
    output.  NULL values are ignored (reference input skips null
    positions).  One group-key shuffle; only k rows per group survive
    the rank filter.
    """
    if k <= 0:
        raise ValueError("desired sample size must be > 0")
    # Priority: hash of (seed, value, physical row id).  The row id
    # gives every copy of a repeated value its own priority, so
    # duplicate rows scatter across the rank order and appear in the
    # sample proportionally — hashing the value ALONE would give a hot
    # value's copies one contiguous rank block (code-review r6
    # finding), and a per-value duplicate-index window would sort all
    # copies of a hot value in one task.
    src = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, value_col)
        .withColumn(
            "__pri",
            F.xxhash64(
                F.lit(seed),
                F.col(value_col).cast("string"),
                F.monotonically_increasing_id(),
            ),
        )
    )
    # processed_count via map-side-combinable groupBy, not a per-group
    # count window (which would funnel each group into one task).
    counts = src.groupBy(*group_cols).agg(
        F.count("*").alias("processed_count"))
    sampled = (
        bottom_k_rank(src, group_cols, [F.col("__pri"), F.col(value_col)], k)
        .groupBy(*group_cols)
        .agg(F.collect_list(value_col).alias("sample"))
    )
    # A group whose values are all NULL must still emit a
    # (0, empty) row — the reference aggregate returns a row per
    # group (code-review r6 finding).
    groups = df.select(*group_cols).distinct()
    vtype = df.schema[value_col].dataType.simpleString()
    return (
        groups.join(counts, list(group_cols), "left")
        .join(sampled, list(group_cols), "left")
        .select(
            *group_cols,
            F.coalesce(F.col("processed_count"), F.lit(0).cast("long"))
            .alias("processed_count"),
            F.coalesce(F.col("sample"), F.array().cast(f"array<{vtype}>"))
            .alias("sample"),
        )
    )


def differential_entropy(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    sample_size: int,
    seed: int = 0,
) -> DataFrame:
    """differential_entropy(sample_size, x) (aggregate.rst:1485):
    reservoir the values, then the Vasicek spacing estimator
    (EntropyCalculations.java:28-45) over the sorted sample::

        m = max(round(sqrt(n)), 2)
        H = (1/n) Σ_i ln( n/(a_i·m) · (s[i+m] − s[i−m]) ) / ln 2

    with boundary clamps s[i+m]→s[n−1], s[i−m]→s[0] and a_i = 2 only
    when both neighbors are interior.  Returns
    ``group_cols + [entropy]`` (double, NaN for empty groups is
    represented as NULL — Spark aggregation convention).
    """
    sampled = reservoir_sample(
        df.select(*group_cols, F.col(x_col).cast("double").alias(x_col)),
        group_cols, x_col, sample_size, seed=seed)
    # Materialize sorted array / n / m as columns BEFORE the fold:
    # referencing array_sort(...) inside the lambda would re-sort the
    # whole sample on every element_at — O(n²·log n) per group instead
    # of O(n) (measured 400× slowdown at 3k samples/group).
    prepared = sampled.select(
        *group_cols,
        F.array_sort("sample").alias("__s"),
        F.size("sample").alias("__n"),
    ).withColumn(
        "__m",
        F.greatest(
            F.round(F.sqrt(F.col("__n").cast("double"))).cast("int"),
            F.lit(2)),
    )
    s, n, m = F.col("__s"), F.col("__n"), F.col("__m")

    def term(acc, i):
        plus = F.when(i + m < n, F.element_at(s, i + m + 1)).otherwise(
            F.element_at(s, n))
        minus = F.when(i - m > 0, F.element_at(s, i - m + 1)).otherwise(
            F.element_at(s, 1))
        a = F.when((i + m < n) & (i - m > 0), F.lit(2.0)).otherwise(F.lit(1.0))
        return acc + F.log(
            n.cast("double") / (a * m.cast("double")) * (plus - minus))

    entropy = F.aggregate(
        F.sequence(F.lit(0), n - 1), F.lit(0.0), term
    ) / n.cast("double") / F.lit(_LN2)
    # n = 0 (all-NULL group): sequence(0, -1) would count DOWN; the
    # reference returns NaN for an empty sample — emit NULL.
    return prepared.select(
        *group_cols, F.when(n > 0, entropy).alias("entropy"))


def _xlogx(w: Column) -> Column:
    """w·ln(w), 0 at w=0 (FixedHistogramStateStrategyUtils.getXLogX)."""
    return F.when(w > 0, w * F.log(w)).otherwise(F.lit(0.0))


def _h_from_aggregates(width: float, sum_w: Column, sum_wlw: Column) -> Column:
    """EntropyCalculations.java:47-51: max((ln(width·ΣW) − Σ(w·ln w)/ΣW)
    / ln 2, 0)."""
    return F.greatest(
        (F.log(F.lit(width) * sum_w) - sum_wlw / sum_w) / F.lit(_LN2),
        F.lit(0.0),
    )


def differential_entropy_histogram(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    weight_col: str | None,
    bucket_count: int,
    min_val: float,
    max_val: float,
    method: str = "fixed_histogram_mle",
) -> DataFrame:
    """differential_entropy(bucket_count, x, weight, method, min, max)
    (aggregate.rst:1542; strategy classes cited in the module
    docstring).  Values outside [min, max) are rejected (the reference
    throws; here the build fails the same contract via an ANSI-free
    NULL filter plus a count check is NOT done — callers own range
    hygiene, matching validateParameters).

    ``method``: 'fixed_histogram_mle' → plain MLE plug-in estimate;
    'fixed_histogram_jacknife' → n·H − Σ_entries c·(n−1)/n·H_holdout
    (FixedHistogramJacknifeStateStrategy.java:93-144, computed per
    (bucket, weight) breakdown entry in closed form — O(buckets), not
    O(n)).  Returns ``group_cols + [entropy]``.
    """
    if method not in ("fixed_histogram_mle", "fixed_histogram_jacknife",
                      "fixed_histogram_both"):
        raise ValueError(f"unknown method: {method}")
    width = (max_val - min_val) / bucket_count
    w = (F.col(weight_col).cast("double") if weight_col is not None
         else F.lit(1.0))
    x = F.col(x_col).cast("double")
    bucket = F.least(
        F.floor(F.lit(bucket_count) * (x - min_val) / (max_val - min_val)),
        F.lit(bucket_count - 1),
    )
    # Breakdown partial: (group, bucket, weight) multiplicity — the
    # FixedDoubleBreakdownHistogram state, map-side combinable.
    entries = (
        df.filter(x.isNotNull() & (x >= min_val) & (x < max_val))
        .groupBy(*group_cols, bucket.alias("__b"), w.alias("__w"))
        .agg(F.count("*").alias("__c"))
    )
    buckets = entries.groupBy(*group_cols, "__b").agg(
        F.sum(F.col("__w") * F.col("__c")).alias("__bw"),
        F.sum("__c").alias("__bn"),
    )
    if method == "fixed_histogram_mle":
        per_group = buckets.groupBy(*group_cols).agg(
            F.sum("__bw").alias("__sw"),
            F.sum(_xlogx(F.col("__bw"))).alias("__swlw"),
        )
        return per_group.select(
            *group_cols,
            _h_from_aggregates(
                width, F.col("__sw"), F.col("__swlw")).alias("entropy"),
        )
    # Jacknife: per-(bucket, weight) holdout entropies against the
    # group-level aggregates (Java loop at :110-123 → one join + sum).
    totals = buckets.groupBy(*group_cols).agg(
        F.sum("__bw").alias("__sw"),
        F.sum(_xlogx(F.col("__bw"))).alias("__swlw"),
        F.sum("__bn").alias("__n"),
    )
    joined = (
        entries.join(buckets, [*group_cols, "__b"])
        .join(totals, group_cols)
    )
    hold_bw = F.greatest(F.col("__bw") - F.col("__w"), F.lit(0.0))
    hold_sw = F.col("__sw") - F.col("__bw") + hold_bw
    hold_swlw = (F.col("__swlw") - _xlogx(F.col("__bw")) + _xlogx(hold_bw))
    n_d = F.col("__n").cast("double")
    # Zero-weight buckets contribute no holdout term (Java guard at
    # :112 `if (weight > 0.0)`).
    holdout = F.when(
        F.col("__bw") > 0,
        F.col("__c").cast("double") * (n_d - 1.0)
        * _h_from_aggregates(width, hold_sw, hold_swlw) / n_d,
    ).otherwise(F.lit(0.0))
    jack = joined.groupBy(*group_cols).agg(
        (
            F.first("__n").cast("double")
            * _h_from_aggregates(
                width, F.first("__sw"), F.first("__swlw"))
            - F.sum(holdout)
        ).alias("entropy"),
        # 'both' (r15 optimization round): the MLE plug-in estimate is a
        # pure function of the (__sw, __swlw) totals the jacknife
        # already aggregates — same _h_from_aggregates expression over
        # the same first() values, so emitting it here is free and a
        # caller needing both estimators runs ONE breakdown pipeline
        # instead of two scans + a join (guide §1.2).
        _h_from_aggregates(
            width, F.first("__sw"), F.first("__swlw"))
        .alias("entropy_mle"),
    )
    if method == "fixed_histogram_both":
        return jack.select(
            *group_cols, F.col("entropy").alias("entropy_jack"),
            "entropy_mle")
    return jack.drop("entropy_mle")
