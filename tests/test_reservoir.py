"""Unit tests for reservoir_sample / differential_entropy
(operators/reservoir.py; reference ReservoirSampleFunction.java and
differentialentropy/ strategies)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from presto_spark.operators import reservoir as R


def test_reservoir_sample_size_and_membership(spark):
    df = spark.range(1000).withColumn("g", (F.col("id") % 3).cast("int"))
    out = R.reservoir_sample(df, ["g"], "id", k=50).collect()
    assert len(out) == 3
    for row in out:
        assert row.processed_count in (333, 334)
        assert len(row.sample) == 50
        assert len(set(row.sample)) == 50
        assert all(v % 3 == row.g for v in row.sample)


def test_reservoir_smaller_group_returns_whole_group(spark):
    df = spark.range(30).withColumn("g", F.lit(1))
    row = R.reservoir_sample(df, ["g"], "id", k=100).collect()[0]
    assert row.processed_count == 30
    assert sorted(row.sample) == list(range(30))


def test_reservoir_deterministic_given_seed(spark):
    df = spark.range(500).withColumn("g", F.lit(1))
    s1 = R.reservoir_sample(df, ["g"], "id", k=20, seed=7).collect()[0].sample
    s2 = R.reservoir_sample(df, ["g"], "id", k=20, seed=7).collect()[0].sample
    s3 = R.reservoir_sample(df, ["g"], "id", k=20, seed=8).collect()[0].sample
    assert sorted(s1) == sorted(s2)
    assert sorted(s1) != sorted(s3)


def test_reservoir_rejects_nonpositive_k(spark):
    df = spark.range(5).withColumn("g", F.lit(1))
    with pytest.raises(ValueError, match="must be > 0"):
        R.reservoir_sample(df, ["g"], "id", k=0)


def _vasicek(samples):
    """Direct port of EntropyCalculations.java:28-45 for the oracle."""
    xs = sorted(samples)
    n = len(xs)
    m = max(round(math.sqrt(n)), 2)
    total = 0.0
    for i in range(n):
        plus = xs[i + m] if i + m < n else xs[n - 1]
        minus = xs[i - m] if i - m > 0 else xs[0]
        a = 2 if (i + m < n and i - m > 0) else 1
        total += math.log(n / (a * m) * (plus - minus))
    return total / n / math.log(2)


def test_vasicek_entropy_matches_reference_formula(spark):
    vals = [float(v % 97) + 0.25 * (v % 11) for v in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").withColumn(
        "g", F.lit(1))
    got = R.differential_entropy(df, ["g"], "x", sample_size=1000).collect()[
        0].entropy
    assert got == pytest.approx(_vasicek(vals), rel=1e-9)


def test_vasicek_entropy_uniform_close_to_log_width(spark):
    """Differential entropy of U(0, 8) is log2(8) = 3 bits."""
    n = 5000
    df = spark.range(n).select(
        (F.col("id") * 8.0 / n).alias("x"), F.lit(1).alias("g"))
    got = R.differential_entropy(df, ["g"], "x", sample_size=10000).collect()[
        0].entropy
    assert abs(got - 3.0) < 0.1


def test_histogram_mle_uniform_exact(spark):
    """Uniform over all B buckets: H = log2(width * n) - log2(n/B)
    ... = log2(max - min) for equal-weight buckets."""
    n = 1200
    df = spark.range(n).select(
        (F.col("id") % 12).cast("double").alias("x"), F.lit(1).alias("g"))
    got = R.differential_entropy_histogram(
        df, ["g"], "x", None, bucket_count=12, min_val=0.0, max_val=12.0,
        method="fixed_histogram_mle").collect()[0].entropy
    # width=1, every bucket weight n/12: H = (ln(1*n) - ln(n/12))/ln2
    assert got == pytest.approx(math.log2(12.0), rel=1e-12)


def test_histogram_jacknife_matches_direct_computation(spark):
    """Closed-form jacknife equals the reference's per-entry holdout
    loop (FixedHistogramJacknifeStateStrategy.java:93-144) replayed in
    Python."""
    data = [(0.5, 1.0), (1.5, 2.0), (1.7, 2.0), (2.5, 1.0), (0.1, 3.0)]
    bucket_count, lo, hi = 3, 0.0, 3.0
    width = (hi - lo) / bucket_count

    def xlogx(w):
        return w * math.log(w) if w > 0 else 0.0

    def h(sw, swlw):
        return max((math.log(width * sw) - swlw / sw) / math.log(2), 0.0)

    buckets = {}
    entries = {}
    for x, w in data:
        b = min(int(bucket_count * (x - lo) / (hi - lo)), bucket_count - 1)
        buckets[b] = buckets.get(b, 0.0) + w
        entries[(b, w)] = entries.get((b, w), 0) + 1
    sw = sum(buckets.values())
    swlw = sum(xlogx(w) for w in buckets.values())
    n = len(data)
    expected = n * h(sw, swlw)
    for (b, w), c in entries.items():
        bw = buckets[b]
        hbw = max(bw - w, 0.0)
        hsw = sw - bw + hbw
        hswlw = swlw - xlogx(bw) + xlogx(hbw)
        expected -= c * (n - 1) * h(hsw, hswlw) / n

    df = spark.createDataFrame(data, "x double, w double").withColumn(
        "g", F.lit(1))
    got = R.differential_entropy_histogram(
        df, ["g"], "x", "w", bucket_count=bucket_count, min_val=lo,
        max_val=hi, method="fixed_histogram_jacknife").collect()[0].entropy
    assert got == pytest.approx(expected, rel=1e-12)


def test_histogram_rejects_unknown_method(spark):
    df = spark.range(5).select(
        F.col("id").cast("double").alias("x"), F.lit(1).alias("g"))
    with pytest.raises(ValueError, match="unknown method"):
        R.differential_entropy_histogram(
            df, ["g"], "x", None, 4, 0.0, 5.0, method="nope")


def test_reservoir_duplicates_sampled_proportionally(spark):
    """A hot value's copies must scatter through the rank order, not
    occupy one block (code-review r6): with 900 copies of one value
    among 1000 rows, a size-50 sample should hold roughly 45 of them
    — never 0 and never all-or-nothing flip-flops."""
    rows = [(1, 7)] * 900 + [(1, v) for v in range(100, 200)]
    df = spark.createDataFrame(rows, "g int, v int")
    out = R.reservoir_sample(df, ["g"], "v", k=50, seed=3).collect()[0]
    n_hot = sum(1 for v in out.sample if v == 7)
    assert 30 <= n_hot <= 50  # ~45 expected; 0 under the old value-hash
    assert out.processed_count == 1000


def test_reservoir_all_null_group_emits_empty_row(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None)], "g int, v int")
    rows = {r.g: r for r in R.reservoir_sample(df, ["g"], "v", k=3).collect()}
    assert rows[1].sample == [5]
    assert rows[2].processed_count == 0 and rows[2].sample == []
