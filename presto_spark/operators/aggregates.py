"""Aggregate builders for Presto aggregation functions Spark lacks.

Reference: presto-main-base/.../operator/aggregation/ (~100
@AggregationFunction registrations).  Everything here returns a Column
usable inside ``df.groupBy(...).agg(...)`` and is built from Spark
built-in aggregates + post-transforms — JVM-side, partial-aggregation
friendly, no pandas UDAFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _run_starts(sorted_arr: Column, eq) -> Column:
    """1-based start positions of equal-runs in a sorted array.

    ``eq(i, j)`` compares elements at 1-based positions i and j.  The
    greatest(i-1, 1) guard avoids element_at(_, 0), which Spark rejects;
    at i=1 the comparison degenerates to self-equality and the explicit
    ``i == 1`` term marks the run start.
    """
    # greatest(n, 1): sequence(1, 0) would DESCEND ([1, 0]) and index 0
    # into the array; an empty input yields starts=[1] and callers guard
    # the whole expression with size > 0.
    n = F.size(sorted_arr)
    return F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: (i == F.lit(1)) | ~eq(i, F.greatest(i - 1, F.lit(1))),
    )


def map_agg(key: Column, value: Column) -> Column:
    """map_agg(k, v) → MAP<K,V> (MapAggregationFunction.java).

    Duplicate keys keep an arbitrary value, matching Presto.
    """
    return F.map_from_entries(F.collect_list(F.struct(key, value)))


def multimap_agg(key: Column, value: Column) -> Column:
    """multimap_agg(k, v) → MAP<K, ARRAY<V>> (multimapagg/).

    Sorted-run construction: sort the collected entries by key, find run
    starts, slice each run — O(n log n) in the group size instead of a
    filter pass per distinct key (O(n·k)), so a hot key cannot blow up
    executor CPU.  For data-sized inputs use :func:`multimap_table`,
    whose shuffle carries (group, key) partial lists instead of whole
    groups.
    """
    s = F.array_sort(F.collect_list(F.struct(key.alias("k"), value.alias("v"))))
    starts = _run_starts(
        s, lambda i, j: F.element_at(s, i)["k"].eqNullSafe(F.element_at(s, j)["k"])
    )
    n = F.size(s)
    return F.when(
        n > 0,
        F.map_from_entries(
            F.transform(
                starts,
                lambda st, x: F.struct(
                    F.element_at(s, st)["k"].alias("key"),
                    F.transform(
                        F.slice(
                            s, st,
                            F.coalesce(F.element_at(starts, x + 2), n + 1) - st,
                        ),
                        lambda e: e["v"],
                    ).alias("value"),
                ),
            )
        ),
    )


def histogram(value: Column) -> Column:
    """histogram(v) → MAP<V, BIGINT> counts (DoubleHistogramAggregation.java).

    Sorted-run counting over the collected values — O(n log n) per
    group, no per-key filter pass.  The collected array is still
    group-sized; for data-sized inputs use :func:`histogram_table`
    (two-level shuffle spelling).
    """
    s = F.array_sort(F.collect_list(value))
    starts = _run_starts(
        s, lambda i, j: F.element_at(s, i).eqNullSafe(F.element_at(s, j))
    )
    n = F.size(s)
    return F.when(
        n > 0,
        F.map_from_entries(
            F.transform(
                starts,
                lambda st, x: F.struct(
                    F.element_at(s, st).alias("key"),
                    (F.coalesce(F.element_at(starts, x + 2), n + 1) - st)
                    .cast("long").alias("value"),
                ),
            )
        ),
    )


def histogram_table(df: DataFrame, group_cols: list, value_col: str) -> DataFrame:
    """histogram(v) per group — the scalable two-level default.

    Level 1 shuffles (group, value) counts with map-side partial
    aggregation (the shuffle carries one row per distinct (group,
    value), never raw rows); level 2 assembles the per-group map from
    already-counted entries.  This is the plan the array-based
    :func:`histogram` approximates for small groups, and the one to use
    when a group can be data-sized.  Returns group_cols + ``hist``.
    """
    counted = (
        df.groupBy(*group_cols, F.col(value_col).alias("__v"))
        .agg(F.count("*").alias("__n"))
    )
    return (
        counted.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__v"), F.col("__n")))
            ).alias("hist")
        )
    )


def multimap_table(
    df: DataFrame, group_cols: list, key_col: str, value_col: str
) -> DataFrame:
    """multimap_agg(k, v) per group — two-level scalable default.

    Level 1 collects values per (group, key) — partial lists combine
    across partitions, so the first shuffle carries per-key lists, not
    whole groups; level 2 assembles the map.  Returns group_cols +
    ``mmap``.
    """
    per_key = (
        df.groupBy(*group_cols, F.col(key_col).alias("__k"))
        .agg(F.array_sort(F.collect_list(value_col)).alias("__vs"))
    )
    return (
        per_key.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__k"), F.col("__vs")))
            ).alias("mmap")
        )
    )


def array_agg_ordered(value: Column, *order_by: Column) -> Column:
    """array_agg(v ORDER BY o...) (AggregationNode.java:102).

    Spark has no agg-level ORDER BY; sort inside the group after
    collecting (struct sort is field-by-field) — no extra shuffle.
    """
    entry = F.struct(*order_by, value.alias("__v"))
    return F.transform(F.array_sort(F.collect_list(entry)), lambda s: s["__v"])


def checksum(col: Column) -> Column:
    """Order-insensitive checksum (ChecksumAggregationFunction.java uses
    xor of xxhash64; sum mod 2^64 of xxhash64 is equally
    order-insensitive and spark-native)."""
    return F.sum(F.xxhash64(col)).cast("long")


def max_n(value: Column, n: int) -> Column:
    """max_n(v, n) → n largest values descending (MaxNAggregationFunction.java)."""
    return F.reverse(F.slice(F.array_sort(F.collect_list(value)), -n, n))


def min_n(value: Column, n: int) -> Column:
    """min_n(v, n) → n smallest values ascending."""
    return F.slice(F.array_sort(F.collect_list(value)), 1, n)


def bool_and(col: Column) -> Column:
    return F.bool_and(col)


def bool_or(col: Column) -> Column:
    return F.bool_or(col)


def geometric_mean(col: Column) -> Column:
    """geometric_mean(x) = exp(avg(ln x)) (GeometricMeanAggregations.java)."""
    return F.exp(F.avg(F.ln(col)))


def reduce_agg(col: Column, zero, merge) -> Column:
    """reduce_agg(x, s0, merge) (ReduceAggregationFunction.java) as
    collect + fold.  For large groups prefer expressing the reduction as
    a native aggregate; this is the general-lambda fallback."""
    return F.aggregate(F.collect_list(col), F.lit(zero), merge)


def set_agg(col: Column) -> Column:
    """set_agg(x) → ARRAY of distinct values (SetAggregationFunction.java).

    Order is unspecified in Presto; sorted here so downstream renders
    are deterministic.
    """
    return F.array_sort(F.collect_set(col))


def map_union(col: Column) -> Column:
    """map_union(m) → union of the group's maps (MapUnionAggregation.java).

    Entry-level flatten keeps it one shuffle; duplicate keys follow the
    engine-wide LAST_WIN pin (collect order is nondeterministic, so with
    duplicate keys across rows the surviving value is arbitrary — same
    contract as Presto, which keeps an arbitrary one).
    """
    return F.map_from_entries(F.flatten(F.collect_list(F.map_entries(col))))


def map_union_sum(col: Column, value_type: str = "long") -> Column:
    """map_union_sum(m) → union of the group's maps with values SUMMED
    per key (MapUnionSumAggregation.java) — the deterministic sibling
    of map_union.  Entry-level flatten, then a per-key fold over the
    distinct keys of the combined entry list: O(k²) over one group's
    key space, state priced in distinct keys.  ``value_type`` picks
    the accumulator type (the reference dispatches on the map's value
    type; Column helpers are monomorphic per call)."""
    entries = F.flatten(F.collect_list(F.map_entries(col)))
    keys = F.array_distinct(F.transform(entries, lambda e: e["key"]))
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.aggregate(
                F.filter(entries, lambda e: e["key"] == k),
                F.lit(0).cast(value_type),
                lambda acc, e: acc + e["value"],
            ),
        ),
    )


def set_union(col: Column) -> Column:
    """set_union(array) → distinct union of the group's arrays
    (SetUnionFunction.java), sorted for deterministic output (Presto's
    order is arbitrary; the sort is the engine-wide oracle-stability
    convention)."""
    return F.array_sort(F.array_distinct(F.flatten(F.collect_list(col))))


def entropy(count_col: Column) -> Column:
    """entropy(c) → Shannon entropy in bits of the count distribution
    (EntropyAggregation.java): log2(S) - sum(c*log2(c))/S, zero counts
    ignored.  Pure power-sum composition — partial-agg friendly."""
    c = F.when(count_col > 0, count_col.cast("double"))
    s = F.sum(c)
    return F.log2(s) - F.sum(c * F.log2(c)) / s
