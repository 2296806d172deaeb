"""Noisy (differential-privacy-style) gaussian aggregates.

Reference: presto-main-base/.../operator/aggregation/noisyaggregation/
NoisyCountAggregationUtils.java:90 (noisy count = round(max(true + N(0,
noise_scale), 0))), NoisySumGaussianAggregation.java,
NoisyAverageGaussianAggregation.java, and the *Clipping* variants that
clip each input to [lower, upper] BEFORE aggregating.

One gaussian draw is added per GROUP (the reference draws one
nextGaussian per aggregation state at output time — getNoise in
NoisyCountAggregationUtils.java:79); we therefore aggregate first and
apply ``randn`` on the per-group result, which evaluates exactly once
per output row.  ``seed`` makes the noise deterministic for a fixed
partitioning (Spark's seeded randn), but does NOT reproduce Java's
``new Random(seed).nextGaussian()`` stream — documented deviation; DP
guarantees depend only on the noise distribution, which matches.

The SFM-sketch family (NoisyApproximateSetSfmAggregation.java) lives
in operators/sfm.py — it is a distinct sketch format, not a noise
wrapper like the aggregates here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _noise(noise_scale: float, seed: int | None) -> Column:
    if noise_scale < 0:
        raise ValueError("noise_scale must be >= 0")
    rnd = F.randn(seed) if seed is not None else F.randn()
    return rnd * F.lit(float(noise_scale))


def _clip(col: Column, lower, upper) -> Column:
    if lower is None and upper is None:
        return col
    out = col
    if lower is not None:
        out = F.greatest(out, F.lit(lower))
    if upper is not None:
        out = F.least(out, F.lit(upper))
    return out


def noisy_count_gaussian(
    df: DataFrame,
    col: str,
    noise_scale: float,
    group_by: tuple[str, ...] = (),
    seed: int | None = None,
    alias: str = "noisy_count",
) -> DataFrame:
    """count(col) + N(0, noise_scale), clamped at 0 and rounded
    (NoisyCountAggregationUtils.java computeNoisyCount)."""
    agg = df.groupBy(*group_by).agg(F.count(col).alias("_true"))
    noisy = F.round(
        F.greatest(F.lit(0.0), F.col("_true") + _noise(noise_scale, seed))
    ).cast("long")
    return agg.select(*group_by, noisy.alias(alias))


def noisy_count_if_gaussian(
    df: DataFrame,
    predicate: Column,
    noise_scale: float,
    group_by: tuple[str, ...] = (),
    seed: int | None = None,
    alias: str = "noisy_count_if",
) -> DataFrame:
    """count_if(predicate) + N(0, noise_scale), clamped at 0 and
    rounded (NoisyCountIfGaussianAggregation.java — same clamp/round
    pipeline as noisy_count)."""
    agg = df.groupBy(*group_by).agg(
        F.count_if(predicate).alias("_true"))
    noisy = F.round(
        F.greatest(F.lit(0.0), F.col("_true") + _noise(noise_scale, seed))
    ).cast("long")
    return agg.select(*group_by, noisy.alias(alias))


def noisy_sum_gaussian(
    df: DataFrame,
    col: str,
    noise_scale: float,
    lower=None,
    upper=None,
    group_by: tuple[str, ...] = (),
    seed: int | None = None,
    alias: str = "noisy_sum",
) -> DataFrame:
    """sum(clip(col)) + N(0, noise_scale)
    (NoisySumGaussianClippingAggregation.java when bounds given)."""
    clipped = _clip(F.col(col), lower, upper)
    agg = df.groupBy(*group_by).agg(
        F.sum(clipped.cast("double")).alias("_true"))
    noisy = (F.col("_true") + _noise(noise_scale, seed)).cast("double")
    return agg.select(*group_by, noisy.alias(alias))


def noisy_avg_gaussian(
    df: DataFrame,
    col: str,
    noise_scale: float,
    lower=None,
    upper=None,
    group_by: tuple[str, ...] = (),
    seed: int | None = None,
    alias: str = "noisy_avg",
) -> DataFrame:
    """avg(clip(col)) + N(0, noise_scale)
    (NoisyAverageGaussianAggregation.java — noise applied to the final
    average, one draw per group)."""
    clipped = _clip(F.col(col), lower, upper)
    agg = df.groupBy(*group_by).agg(
        F.avg(clipped.cast("double")).alias("_true"))
    noisy = (F.col("_true") + _noise(noise_scale, seed)).cast("double")
    return agg.select(*group_by, noisy.alias(alias))
