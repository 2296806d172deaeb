"""Aggregate builders for Presto aggregation functions Spark lacks.

Reference: presto-main-base/.../operator/aggregation/ (~100
@AggregationFunction registrations).  Everything here returns a Column
usable inside ``df.groupBy(...).agg(...)`` and is built from Spark
built-in aggregates + post-transforms — JVM-side, partial-aggregation
friendly, no pandas UDAFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def map_agg(key: Column, value: Column) -> Column:
    """map_agg(k, v) → MAP<K,V> (MapAggregationFunction.java).

    Duplicate keys keep an arbitrary value, matching Presto.
    """
    return F.map_from_entries(F.collect_list(F.struct(key, value)))


def multimap_agg(key: Column, value: Column) -> Column:
    """multimap_agg(k, v) → MAP<K, ARRAY<V>> (multimapagg/).

    Composition: collect entries, group per key via map_from_entries on
    (key → collected list) built with a nested aggregate.
    """
    entries = F.collect_list(F.struct(key.alias("k"), value.alias("v")))
    keys = F.array_distinct(F.transform(entries, lambda e: e["k"]))
    return F.map_from_entries(
        F.transform(
            keys,
            lambda k: F.struct(
                k.alias("key"),
                F.transform(
                    F.filter(entries, lambda e: e["k"] == k), lambda e: e["v"]
                ).alias("value"),
            ),
        )
    )


def histogram(value: Column) -> Column:
    """histogram(v) → MAP<V, BIGINT> counts (DoubleHistogramAggregation.java).

    Built as map over collected values; for high-cardinality inputs
    pre-aggregate with groupBy(value).count() instead (the scalable
    spelling — this builder is for per-group maps of modest size).
    """
    vals = F.collect_list(value)
    keys = F.array_distinct(vals)
    return F.map_from_entries(
        F.transform(
            keys,
            lambda k: F.struct(
                k.alias("key"),
                F.size(F.filter(vals, lambda v: v == k)).cast("long").alias("value"),
            ),
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


def entropy(count_col: Column) -> Column:
    """entropy(c) → Shannon entropy in bits of the count distribution
    (EntropyAggregation.java): log2(S) - sum(c*log2(c))/S, zero counts
    ignored.  Pure power-sum composition — partial-agg friendly."""
    c = F.when(count_col > 0, count_col.cast("double"))
    s = F.sum(c)
    return F.log2(s) - F.sum(c * F.log2(c)) / s
