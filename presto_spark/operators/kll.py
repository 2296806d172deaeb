"""KLL sketch surface: sketch_kll / sketch_kll_with_k /
sketch_kll_quantile / sketch_kll_rank.

Reference: presto-docs/src/main/sphinx/functions/sketch.rst:38-75 (the
DataSketches KLL quantile family; aggregation in
presto-main-base/.../aggregation/sketch/kll/, scalars in
operator/scalar/sketch/KllSketchFunctions area).

The engine already ships a KLL-style deterministic weighted coreset
(operators/qsketch.py — build/merge/compact with the KLL compaction
bound); this module exposes the reference's KLL names over that sketch
value plus the two query scalars as JVM-side Column folds:

* ``sketch_kll_quantile(sketch, rank[, inclusive])`` — the value at
  the first entry whose cumulative weight reaches rank × total
  (inclusive: ≥; exclusive: >), clamped to the last entry —
  KllSketch.getQuantile semantics.
* ``sketch_kll_rank(sketch, value[, inclusive])`` — the weight
  fraction of entries below (inclusive: ≤, exclusive: <) the value —
  KllSketch.getRank semantics.

Pinned deviation (same as qsketch): the stored form is the
(vs, ws) struct pair, not the DataSketches little-endian payload —
sketch bytes are engine-specific repo-wide; estimator semantics match.
In the exact regime (group size ≤ k, every weight 1) both scalars are
exactly the order statistics, which is what the differential query
replays in DuckDB.

Scale: sketch build/merge inherit qsketch's two-level sharded
applyInPandas shape; the scalars are array folds priced in k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presto_spark.operators.qsketch import (
    merge_quantile_sketches,
    quantile_sketch_agg,
)

DEFAULT_K = 200  # DataSketches KLL default k (sketch.rst sketch_kll)


def sketch_kll(
    df: DataFrame, group_cols: list[str], value_col: str,
    n_shards: int = 32,
) -> DataFrame:
    """sketch_kll(x) aggregate (sketch.rst:45) — default k.

    ``n_shards`` caps the per-pandas-batch row count at
    |group|/n_shards (qsketch two-level shape); lower it for
    small-group workloads where shard overhead dominates."""
    return quantile_sketch_agg(df, group_cols, value_col, k=DEFAULT_K,
                               n_shards=n_shards)


def sketch_kll_with_k(
    df: DataFrame, group_cols: list[str], value_col: str, k: int,
    n_shards: int = 32,
) -> DataFrame:
    """sketch_kll_with_k(x, k) aggregate (sketch.rst:50); k in
    [8, 65535] per the reference contract."""
    if not 8 <= k <= 65535:
        raise ValueError("k must be in [8, 65535]")
    return quantile_sketch_agg(df, group_cols, value_col, k=k,
                               n_shards=n_shards)


def merge_kll(df: DataFrame, group_cols: list[str],
              k: int = DEFAULT_K) -> DataFrame:
    """Rollup of stored KLL sketch rows (the aggregation combine step)."""
    return merge_quantile_sketches(df, group_cols, k=k)


def _entries(vs: Column, ws: Column) -> Column:
    return F.zip_with(
        vs, ws, lambda v, w: F.struct(v.alias("v"), w.alias("w")))


def sketch_kll_quantile(
    vs: Column, ws: Column, rank: Column | float, inclusive: bool = True
) -> Column:
    """sketch_kll_quantile(sketch, rank[, inclusivity])
    (sketch.rst:60-66)."""
    rank = rank if isinstance(rank, Column) else F.lit(float(rank))
    total = F.aggregate(ws, F.lit(0.0), lambda a, w: a + w)
    target = rank * total
    acc0 = F.struct(
        F.lit(0.0).alias("cum"),
        F.lit(None).cast("double").alias("val"),
    )

    def step(acc, e):
        cum = acc["cum"] + e["w"]
        hit = (cum >= target) if inclusive else (cum > target)
        return F.struct(
            cum.alias("cum"),
            F.coalesce(acc["val"], F.when(hit, e["v"])).alias("val"),
        )

    # try_element_at: an EMPTY sketch must fall through to NULL, not
    # throw under ANSI mode (session-proof rule; code-review r6).
    return F.aggregate(
        _entries(vs, ws), acc0, step,
        lambda acc: F.coalesce(acc["val"], F.try_element_at(vs, F.lit(-1))),
    )


def sketch_kll_rank(
    vs: Column, ws: Column, value: Column | float, inclusive: bool = True
) -> Column:
    """sketch_kll_rank(sketch, value[, inclusivity]) (sketch.rst:68-75)."""
    value = value if isinstance(value, Column) else F.lit(float(value))
    total = F.aggregate(ws, F.lit(0.0), lambda a, w: a + w)
    below = F.aggregate(
        _entries(vs, ws), F.lit(0.0),
        lambda a, e: a + F.when(
            (e["v"] <= value) if inclusive else (e["v"] < value), e["w"]
        ).otherwise(F.lit(0.0)),
    )
    return F.when(total > 0, below / total)
