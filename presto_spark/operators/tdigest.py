"""T-Digest surface: tdigest_agg / merge_tdigest / value_at_quantile /
values_at_quantiles / quantile_at_value / scale_tdigest / trimmed_mean.

Reference: presto-main-base/.../operator/aggregation/
TDigestAggregationFunction.java (build/merge with optional per-row
weight) and operator/scalar/TDigestFunctions.java:68-152
(values_at_quantiles, quantile_at_value, scale_tdigest, trimmed_mean);
the qdigest query scalars quantile_at_value/values_at_quantiles share
semantics (QuantileDigestFunctions.java:75-110).  Docs
functions/tdigest.rst / qdigest.rst.

The engine's quantile-sketch value (operators/qsketch.py — a
deterministic KLL-style weighted coreset stored as parallel
``vs``/``ws`` arrays) already provides the mergeable build; this
module adds the reference's T-Digest names plus the scalars the engine
lacked, all as JVM-side Column folds (no UDFs):

* ``quantile_at_value(sketch, v)`` — cumulative weight of entries
  ≤ v over total weight (NULL outside the sketch's value range, the
  reference's contract for values below min / above max).
* ``values_at_quantiles(sketch, qs)`` — transform over the quantile
  array, one cumulative-walk fold per element.
* ``scale_tdigest(sketch, factor)`` — multiplies every entry weight
  (TDigestFunctions.java:104-111: negative factor rejected); quantile
  positions are invariant, downstream weighted merges shift.
* ``trimmed_mean(sketch, lo, hi)`` — weight-overlap mean of entries
  whose cumulative span intersects [lo·W, hi·W].

Pinned deviation (same as qsketch/kll): the stored form is the
(vs, ws) pair, not Presto's serialized centroid tree — sketch bytes
are engine-specific repo-wide; per-entry weights here are collapsed
sample weights rather than t-digest centroid weights, so accuracy
concentrates uniformly instead of at the tails (documented; the
differential tests run the exact regime where both are lossless).

Scale: build/merge inherit qsketch's sharded applyInPandas shape;
every scalar is an array fold priced in k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presto_spark.operators.kll import sketch_kll_quantile, sketch_kll_rank
from presto_spark.operators.qsketch import (
    merge_quantile_sketches,
    quantile_sketch_agg,
)

DEFAULT_COMPRESSION = 100  # TDigestAggregationFunction default


def tdigest_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    compression: int = DEFAULT_COMPRESSION,
    n_shards: int = 32,
) -> DataFrame:
    """tdigest_agg(x[, w, compression]) (TDigestAggregationFunction
    .java).  Coreset size k = 4·compression ≈ centroid budget."""
    return quantile_sketch_agg(df, group_cols, value_col,
                               k=4 * compression, n_shards=n_shards)


def merge_tdigest(
    df: DataFrame, group_cols: list[str],
    compression: int = DEFAULT_COMPRESSION,
) -> DataFrame:
    """merge(tdigest) rollup."""
    return merge_quantile_sketches(df, group_cols, k=4 * compression)


def value_at_quantile(vs: Column, ws: Column, q) -> Column:
    """value_at_quantile(tdigest, q) (TDigestFunctions.java:55)."""
    return sketch_kll_quantile(vs, ws, q, inclusive=True)


def values_at_quantiles(vs: Column, ws: Column, qs: Column) -> Column:
    """values_at_quantiles(tdigest, qs) (TDigestFunctions.java:68):
    one cumulative fold per requested quantile."""
    return F.transform(
        qs, lambda q: sketch_kll_quantile(vs, ws, q, inclusive=True))


def quantile_at_value(vs: Column, ws: Column, value) -> Column:
    """quantile_at_value(tdigest, v) (TDigestFunctions.java:82;
    QuantileDigestFunctions.java:75-110): rank of v, NULL when v lies
    outside the sketch's observed range (the reference returns NULL
    below min / above max)."""
    value = value if isinstance(value, Column) else F.lit(float(value))
    in_range = (F.size(vs) > 0) & (value >= F.try_element_at(vs, F.lit(1))) & (
        value <= F.try_element_at(vs, F.lit(-1)))
    return F.when(in_range, sketch_kll_rank(vs, ws, value, inclusive=True))


def scale_tdigest(ws: Column, factor) -> Column:
    """scale_tdigest(tdigest, factor) (TDigestFunctions.java:104-111):
    new weights array; negative factors yield NULL (expression-level
    spelling of the reference's throw)."""
    factor = factor if isinstance(factor, Column) else F.lit(float(factor))
    return F.when(
        factor >= 0, F.transform(ws, lambda w: w * factor))


def trimmed_mean(vs: Column, ws: Column, lo, hi) -> Column:
    """trimmed_mean(tdigest, lo, hi) (TDigestFunctions.java:147-152):
    weighted mean of the value mass between the lo and hi quantiles —
    each entry contributes the overlap of its cumulative span
    [c_prev, c] with [lo·W, hi·W]."""
    lo = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi = hi if isinstance(hi, Column) else F.lit(float(hi))
    total = F.aggregate(ws, F.lit(0.0), lambda a, w: a + w)
    lo_t, hi_t = lo * total, hi * total
    entries = F.zip_with(
        vs, ws, lambda v, w: F.struct(v.alias("v"), w.alias("w")))
    acc0 = F.struct(
        F.lit(0.0).alias("cum"),
        F.lit(0.0).alias("num"),
        F.lit(0.0).alias("den"),
    )

    def step(acc, e):
        c0 = acc["cum"]
        c1 = c0 + e["w"]
        overlap = F.greatest(
            F.least(c1, hi_t) - F.greatest(c0, lo_t), F.lit(0.0))
        return F.struct(
            c1.alias("cum"),
            (acc["num"] + e["v"] * overlap).alias("num"),
            (acc["den"] + overlap).alias("den"),
        )

    return F.aggregate(
        entries, acc0, step,
        lambda acc: F.when(acc["den"] > 0, acc["num"] / acc["den"]),
    )


def quantiles_at_values(vs: Column, ws: Column, values: Column) -> Column:
    """quantiles_at_values(tdigest, vs) (TDigestFunctions.java sibling
    of values_at_quantiles; QuantileDigestFunctions.java:100-110): one
    rank fold per probed value, NULL outside the observed range."""
    return F.transform(values, lambda v: quantile_at_value(vs, ws, v))


def scale_qdigest(ws: Column, factor) -> Column:
    """scale_qdigest(qdigest, factor) (QuantileDigestFunctions.java
    scaleQDigest) — same weight-multiply as scale_tdigest (one sketch
    model serves both names here)."""
    return scale_tdigest(ws, factor)


def destructure_tdigest(vs: Column, ws: Column) -> Column:
    """destructure_tdigest (TDigestFunctions.java destructureTDigest) →
    row(centroid_means, centroid_weights, min, max, sum, count).
    Compression is a build-time parameter in this model (not stored in
    the sketch value) — callers track it, pinned field omission."""
    total = F.aggregate(ws, F.lit(0.0), lambda a, w: a + w)
    wsum = F.aggregate(
        F.zip_with(vs, ws, lambda v, w: v * w),
        F.lit(0.0), lambda a, x: a + x)
    # try_element_at: empty sketches yield NULL min/max instead of an
    # ANSI-mode throw (session-proof rule; code-review r6).
    return F.struct(
        vs.alias("centroid_means"),
        ws.alias("centroid_weights"),
        F.try_element_at(vs, F.lit(1)).alias("min"),
        F.try_element_at(vs, F.lit(-1)).alias("max"),
        wsum.alias("sum"),
        total.alias("count"),
    )


def construct_tdigest(means: Column, weights: Column) -> Column:
    """construct_tdigest (TDigestFunctions.java constructTDigest) →
    the (vs, ws) sketch pair as a struct, value-sorted (the stored
    invariant).  min/max/sum/count args of the reference signature
    are derivable from the arrays here, so the engine takes just the
    centroids — compression is a rollup-time parameter (pinned, same
    as destructure)."""
    entries = F.array_sort(F.zip_with(
        means, weights, lambda v, w: F.struct(v.alias("v"), w.alias("w"))))
    return F.struct(
        F.transform(entries, lambda e: e["v"]).alias("vs"),
        F.transform(entries, lambda e: e["w"]).alias("ws"),
    )
