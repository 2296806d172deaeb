"""Unit tests for sketch aggregates (operators/sketches.py).

Mirrors the reference's bound-asserting strategy
(TestApproximateCountDistinctAggregation.java) — envelopes for
approximate values, exact checks for deterministic compositions.
"""

from __future__ import annotations

import pytest
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


# ---- mergeable quantile sketches (qsketch.py; reference:
# QuantileDigestAggregationFunction.java / QuantileDigestFunctions.java) ----

def test_qsketch_compact_preserves_weight_and_bounds_rank_error():
    import numpy as np
    from presto_spark.operators.qsketch import _build, _value_at

    rng = np.random.RandomState(42)
    vals = rng.lognormal(4.0, 1.0, size=50_000)
    vs, ws = _build(vals, k=512)
    assert len(vs) <= 512
    assert abs(ws.sum() - len(vals)) < 1e-6  # total weight exact
    exact = np.sort(vals)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        est = _value_at(vs, ws, q)
        # estimate's true rank within ±2% of q
        rank = np.searchsorted(exact, est) / len(vals)
        assert abs(rank - q) < 0.02, (q, rank)


def test_qsketch_merge_is_order_insensitive_and_accurate():
    import numpy as np
    from presto_spark.operators.qsketch import _build, _merge, _value_at

    rng = np.random.RandomState(7)
    parts = [rng.normal(100, 15, size=n) for n in (5000, 300, 12000, 80)]
    sketches = [_build(p, 256) for p in parts]
    f = _merge([s[0] for s in sketches], [s[1] for s in sketches], 256)
    r = _merge([s[0] for s in reversed(sketches)],
               [s[1] for s in reversed(sketches)], 256)
    # determinism: same entries regardless of merge order
    assert np.allclose(f[0], r[0]) and np.allclose(f[1], r[1])
    allv = np.sort(np.concatenate(parts))
    for q in (0.25, 0.5, 0.75):
        rank = np.searchsorted(allv, _value_at(*f, q)) / len(allv)
        assert abs(rank - q) < 0.03, (q, rank)


def test_qsketch_spark_two_level_rollup(spark):
    from pyspark.sql import functions as F
    from presto_spark.operators import qsketch

    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("g"),
        ((F.col("id") * 2654435761) % 100_000).cast("double").alias("v"),
    )
    partials = qsketch.quantile_sketch_agg(
        df, ["g"], "v", k=256, n_shards=4)
    merged = qsketch.merge_quantile_sketches(partials, ["g"], k=256)
    rows = merged.select(
        "g", qsketch.sketch_quantiles_col([0.5]).alias("est")
    ).collect()
    assert len(rows) == 4
    for r in rows:
        # v is uniform-ish on [0, 100k) within each group
        assert 40_000 < r.est[0] < 60_000, (r.g, r.est)


# ---- noisy gaussian aggregates (noisyaggregation/ package) ----

def test_noisy_zero_scale_is_exact(spark):
    """noise_scale=0 degenerates to the exact aggregate — pins the
    noise-free arithmetic (NoisyCountAggregationUtils.computeNoisyCount
    with noise=0)."""
    from presto_spark.operators import noisy

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double")
    rows = {r.k: r.noisy_count for r in noisy.noisy_count_gaussian(
        df, "v", 0.0, group_by=("k",)).collect()}
    assert rows == {"a": 2, "b": 1}
    rows = {r.k: r.noisy_sum for r in noisy.noisy_sum_gaussian(
        df, "v", 0.0, group_by=("k",)).collect()}
    assert rows == {"a": 3.0, "b": 10.0}
    # clipping applies per-row BEFORE the sum (Clipping variants)
    rows = {r.k: r.noisy_sum for r in noisy.noisy_sum_gaussian(
        df, "v", 0.0, lower=0.0, upper=1.5, group_by=("k",)).collect()}
    assert rows == {"a": 2.5, "b": 1.5}
    (row,) = noisy.noisy_avg_gaussian(df, "v", 0.0).collect()
    assert abs(row.noisy_avg - 13.0 / 3) < 1e-12


def test_noisy_count_never_negative(spark):
    """Clamp-at-zero (computeNoisyCount Math.max(noisy, 0)): with huge
    noise on a tiny count, every draw must still come back >= 0."""
    from presto_spark.operators import noisy

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    for seed in range(8):
        (row,) = noisy.noisy_count_gaussian(
            df, "v", 1e6, group_by=("k",), seed=seed).collect()
        assert row.noisy_count >= 0


# ---- SetDigest (operators/setdigest.py) ----


def _digest_for(spark, rows, max_hashes=8192):
    from presto_spark.operators import setdigest as SD

    df = spark.createDataFrame(rows, "g string, v string")
    return SD.make_set_digest(df, ["g"], "v", max_hashes=max_hashes)


def test_setdigest_exact_regime(spark):
    """Below max_hashes the digest IS the set: exact cardinality,
    exact intersection (SetDigest.java:142-163)."""
    from presto_spark.operators import setdigest as SD
    from pyspark.sql import functions as F

    rows = [("a", str(i)) for i in range(40)] + [
        ("b", str(i)) for i in range(20, 70)
    ]
    dig = _digest_for(spark, rows)
    a = dig.filter(F.col("g") == "a").select(F.col("digest").alias("da"))
    b = dig.filter(F.col("g") == "b").select(F.col("digest").alias("db"))
    row = (
        a.crossJoin(b)
        .select(
            SD.cardinality(F.col("da")).alias("ca"),
            SD.cardinality(F.col("db")).alias("cb"),
            SD.intersection_cardinality(F.col("da"), F.col("db")).alias("ic"),
        )
        .collect()[0]
    )
    assert (row.ca, row.cb, row.ic) == (40, 50, 20)


def test_setdigest_truncation_and_exactness_rule(spark):
    """Strictly-fewer-than-max retained hashes == exact
    (SetDigest.java:142-148); at or past max the minhash truncates to
    the k smallest and exactness flips off."""
    from pyspark.sql import functions as F

    rows = [("a", str(i)) for i in range(64)]
    exact = _digest_for(spark, rows, max_hashes=65).collect()[0].digest
    assert exact.exact and len(exact.hashes) == 64
    trunc = _digest_for(spark, rows, max_hashes=64).collect()[0].digest
    assert not trunc.exact and len(trunc.hashes) == 64
    assert trunc.hashes == sorted(exact.hashes)[:64]
    smaller = _digest_for(spark, rows, max_hashes=16).collect()[0].digest
    assert not smaller.exact
    assert smaller.hashes == sorted(exact.hashes)[:16]


def test_setdigest_hash_counts_multiplicity(spark):
    """hash_counts carries saturating multiplicities
    (SetDigestFunctions.java:81, SetDigest.java:198-207)."""
    from presto_spark.operators import setdigest as SD
    from pyspark.sql import functions as F

    rows = [("a", "x")] * 3 + [("a", "y")] * 2 + [("a", "z")]
    dig = _digest_for(spark, rows)
    counts = (
        dig.select(SD.hash_counts(F.col("digest")).alias("m"))
        .collect()[0]
        .m
    )
    assert sorted(counts.values()) == [1, 2, 3]


def test_setdigest_merge_equals_direct(spark):
    """merge_set_digest over partials == digest built directly
    (SetDigest.java:209-221): same hashes, summed counts."""
    from presto_spark.operators import setdigest as SD
    from pyspark.sql import functions as F

    rows = [("a", "p1", str(i)) for i in range(30)] + [
        ("a", "p2", str(i)) for i in range(15, 45)
    ]
    df = spark.createDataFrame(rows, "g string, part string, v string")
    direct = SD.make_set_digest(df, ["g"], "v").collect()[0].digest
    partials = SD.make_set_digest(df, ["g", "part"], "v")
    merged = (
        SD.merge_set_digests(partials, ["g"]).collect()[0].digest
    )
    assert merged.hashes == direct.hashes
    assert merged.counts == direct.counts
    assert merged.exact == direct.exact


def test_setdigest_jaccard_identical_and_disjoint(spark):
    from presto_spark.operators import setdigest as SD
    from pyspark.sql import functions as F

    rows = [("a", str(i)) for i in range(25)] + [
        ("b", str(i)) for i in range(25)
    ] + [("c", str(i)) for i in range(100, 125)]
    dig = _digest_for(spark, rows)
    d = {r.g: r.digest for r in dig.collect()}
    df = spark.createDataFrame(
        [(d["a"], d["b"], d["c"])],
        dig.select(
            F.col("digest").alias("da"),
            F.col("digest").alias("db"),
            F.col("digest").alias("dc"),
        ).schema,
    )
    row = df.select(
        SD.jaccard_index(F.col("da"), F.col("db")).alias("same"),
        SD.jaccard_index(F.col("da"), F.col("dc")).alias("disjoint"),
    ).collect()[0]
    assert row.same == 1.0
    assert row.disjoint == 0.0


# ---- KHyperLogLog (operators/khll.py) ----


def test_khll_uniqueness_and_reidentification(spark):
    """Exact-regime KHLL: per-value uii cardinalities are coupon-exact,
    so the distribution and reidentification potential are exact
    (KHyperLogLog.java:297-327)."""
    from presto_spark.operators import khll as K
    from pyspark.sql import functions as F

    # value v1 seen with 1 user, v2 with 2, v3 with 3, v4 with 1
    rows = []
    for v, nu in (("v1", 1), ("v2", 2), ("v3", 3), ("v4", 1)):
        rows += [("g", v, f"{v}_u{i}") for i in range(nu)]
    df = spark.createDataFrame(rows, "g string, v string, u string")
    dig = K.khyperloglog_agg(df, ["g"], "v", "u")
    d = F.col("khll")
    row = dig.select(
        K.cardinality(d).alias("card"),
        K.uniqueness_distribution(d, histogram_size=3).alias("dist"),
        K.reidentification_potential(d, 1).alias("rp1"),
        K.reidentification_potential(d, 2).alias("rp2"),
    ).collect()[0]
    assert row.card == 4
    assert row.dist == {1: 0.5, 2: 0.25, 3: 0.25}
    assert row.rp1 == 0.5
    assert row.rp2 == 0.75


def test_khll_histogram_clamps_and_zero_fills(spark):
    from presto_spark.operators import khll as K
    from pyspark.sql import functions as F

    rows = [("g", "v", f"u{i}") for i in range(9)]  # one value, 9 users
    df = spark.createDataFrame(rows, "g string, v string, u string")
    dig = K.khyperloglog_agg(df, ["g"], "v", "u")
    dist = dig.select(
        K.uniqueness_distribution(F.col("khll"), histogram_size=4).alias("d")
    ).collect()[0].d
    # 9 users clamp into the top bucket; buckets 1..3 present as zeros
    assert dist == {1: 0.0, 2: 0.0, 3: 0.0, 4: 1.0}


def test_khll_merge_equals_direct(spark):
    from presto_spark.operators import khll as K
    from pyspark.sql import functions as F

    rows = [("g", "p1", f"v{i % 5}", f"u{i}") for i in range(20)] + [
        ("g", "p2", f"v{i % 7}", f"u{i + 100}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, part string, v string, u string")
    direct = K.khyperloglog_agg(df, ["g"], "v", "u")
    partials = K.khyperloglog_agg(df, ["g", "part"], "v", "u")
    merged = K.merge_khll(partials, ["g"])
    a = direct.select(
        K.cardinality(F.col("khll")).alias("c"),
        K.uniqueness_distribution(F.col("khll"), 8).alias("d"),
    ).collect()[0]
    b = merged.select(
        K.cardinality(F.col("khll")).alias("c"),
        K.uniqueness_distribution(F.col("khll"), 8).alias("d"),
    ).collect()[0]
    assert a.c == b.c == 7
    assert a.d == b.d


def test_khll_truncation_density_estimator(spark):
    """Past max_hashes the cardinality falls back to the bottom-k
    density estimator (KHyperLogLog.java:259-272) — envelope check."""
    from presto_spark.operators import khll as K
    from pyspark.sql import functions as F

    rows = [("g", f"value_{i}", "u") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v string, u string")
    dig = K.khyperloglog_agg(df, ["g"], "v", "u", max_hashes=256)
    row = dig.select(
        F.col("khll.exact").alias("exact"),
        F.size("khll.hashes").alias("k"),
        K.cardinality(F.col("khll")).alias("card"),
    ).collect()[0]
    assert not row.exact and row.k == 256
    assert abs(row.card - 5000) <= 0.25 * 5000


def test_setdigest_merge_mixed_max_hashes_stays_inexact(spark):
    """Merging a truncated (inexact) digest with a larger-max digest
    must re-truncate to the SMALLEST max_hashes and stay inexact —
    reference SetDigest.mergeWith keeps the receiver's maxHashes.
    Regression pin for the r5 ADVICE finding: F.max + recomputed
    exactness marked such merges exact and returned the retained-hash
    count (a severe undercount) instead of the HLL estimate."""
    from presto_spark.operators import setdigest as SD
    from pyspark.sql import functions as F

    rows_small = [("a", str(i)) for i in range(64)]        # truncated @16
    rows_big = [("a", str(i)) for i in range(64, 96)]      # exact @8192
    trunc = _digest_for(spark, rows_small, max_hashes=16)
    exact = _digest_for(spark, rows_big, max_hashes=8192)
    merged = (
        SD.merge_set_digests(trunc.unionByName(exact), ["g"])
        .collect()[0]
        .digest
    )
    assert merged.max_hashes == 16
    assert not merged.exact
    assert len(merged.hashes) <= 16
    # cardinality must take the HLL branch: the true union has 96
    # distinct values; the retained-hash count (<=16) would be the
    # undercount the fix prevents.
    card = (
        SD.merge_set_digests(trunc.unionByName(exact), ["g"])
        .select(SD.cardinality(F.col("digest")).alias("c"))
        .collect()[0]
        .c
    )
    assert card > 16


# ---- theta sketches (operators/theta.py;
# ThetaSketchAggregationFunction.java, ThetaSketchFunctions.java) ----

def test_theta_exact_regime_and_set_ops(spark):
    """Below k the sketch is exact (theta=1): estimate and all set
    operations equal exact set algebra."""
    from presto_spark.operators import theta as T

    a = spark.range(0, 300).withColumn("g", F.lit("a"))
    b = spark.range(200, 500).withColumn("g", F.lit("b"))
    dig = T.sketch_theta(a.union(b), ["g"], "id", k=1024)
    row = (
        dig.filter(F.col("g") == "a").select(F.col("sketch").alias("sa"))
        .crossJoin(
            dig.filter(F.col("g") == "b").select(F.col("sketch").alias("sb")))
        .select(
            T.sketch_theta_estimate(F.col("sa")).alias("ea"),
            T.sketch_theta_estimate(
                T.theta_union(F.col("sa"), F.col("sb"))).alias("u"),
            T.sketch_theta_estimate(
                T.theta_intersect(F.col("sa"), F.col("sb"))).alias("i"),
            T.sketch_theta_estimate(
                T.theta_a_not_b(F.col("sa"), F.col("sb"))).alias("d"),
        )
        .collect()[0]
    )
    assert (row.ea, row.u, row.i, row.d) == (300.0, 500.0, 100.0, 200.0)


def test_theta_estimate_envelope_and_merge(spark):
    """Overflowed sketch: theta < 1, retained == k, estimate within
    3/sqrt(k) of truth; union rollup of partials == direct sketch."""
    from presto_spark.operators import theta as T

    n, k = 20000, 256
    df = spark.range(n).withColumn("g", F.lit("x")).withColumn(
        "p", (F.col("id") % 4).cast("int"))
    direct = T.sketch_theta(df, ["g"], "id", k=k)
    merged = T.merge_theta_sketches(
        T.sketch_theta(df, ["g", "p"], "id", k=k), ["g"])
    drow = direct.select(
        T.sketch_theta_summary(F.col("sketch")).alias("s")).collect()[0].s
    assert drow.retained_entries == k
    assert 0 < drow.theta < 1
    assert abs(drow.estimate / n - 1) <= 3 / (k ** 0.5)
    assert drow.lower_bound_std <= drow.estimate <= drow.upper_bound_std
    pair = direct.select("g", F.col("sketch").alias("a")).join(
        merged.select("g", F.col("sketch").alias("b")), "g").collect()[0]
    assert pair.a.hashes == pair.b.hashes and pair.a.theta == pair.b.theta


def test_theta_union_overflow_promotes_theta_ansi_proof(spark):
    """Scalar union past k re-truncates and promotes theta to the
    (k+1)-th hash; expression must hold under ANSI mode too
    (session-proof rule, VERDICT r5 #2)."""
    from presto_spark.operators import theta as T

    a = spark.range(0, 64).withColumn("g", F.lit("a"))
    b = spark.range(64, 128).withColumn("g", F.lit("b"))
    dig = T.sketch_theta(a.union(b), ["g"], "id", k=64)
    pair = (
        dig.filter(F.col("g") == "a").select(F.col("sketch").alias("sa"))
        .crossJoin(
            dig.filter(F.col("g") == "b").select(F.col("sketch").alias("sb")))
    )
    old = spark.conf.get("spark.sql.ansi.enabled", "false")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        row = pair.select(
            T.theta_union(F.col("sa"), F.col("sb")).alias("u")).collect()[0].u
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert len(row.hashes) == 64 and row.theta != "g"
    assert all(h < row.theta for h in row.hashes)
    est = 64 / (int(row.theta[:13], 16) / 16.0 ** 13)
    assert abs(est / 128 - 1) <= 3 / 8.0


# ---- KLL surface (operators/kll.py; sketch.rst:38-75) ----

def test_kll_quantile_rank_exact_regime(spark):
    from presto_spark.operators import kll

    df = spark.range(1, 101).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
    sk = kll.sketch_kll_with_k(df, ["g"], "v", k=256)
    row = sk.select(
        kll.sketch_kll_quantile(F.col("vs"), F.col("ws"), 0.5).alias("m"),
        kll.sketch_kll_quantile(
            F.col("vs"), F.col("ws"), 0.5, inclusive=False).alias("me"),
        kll.sketch_kll_rank(F.col("vs"), F.col("ws"), 30.0).alias("r"),
        kll.sketch_kll_rank(
            F.col("vs"), F.col("ws"), 30.0, inclusive=False).alias("re"),
    ).collect()[0]
    # 100 unit weights: inclusive median = 50th value, exclusive = 51st
    assert (row.m, row.me) == (50.0, 51.0)
    assert (row.r, row.re) == (0.30, 0.29)


def test_kll_estimating_regime_rank_error_bound(spark):
    from presto_spark.operators import kll

    n, k = 50000, 200
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
    sk = kll.sketch_kll_with_k(df, ["g"], "v", k=k)
    row = sk.select(
        F.size("vs").alias("entries"),
        kll.sketch_kll_quantile(F.col("vs"), F.col("ws"), 0.5).alias("m"),
        kll.sketch_kll_rank(
            F.col("vs"), F.col("ws"), float(n) * 0.25).alias("r"),
    ).collect()[0]
    assert row.entries <= k
    assert abs(row.m / (n * 0.5) - 1) < 0.15
    assert abs(row.r - 0.25) < 0.05


def test_kll_with_k_bounds(spark):
    from presto_spark.operators import kll

    df = spark.range(5).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match=r"\[8, 65535\]"):
        kll.sketch_kll_with_k(df, ["g"], "v", k=4)


# ---- T-Digest surface (operators/tdigest.py;
# TDigestFunctions.java:55-152) ----

def test_tdigest_scalars_exact_regime(spark):
    from presto_spark.operators import tdigest as TD

    df = spark.range(1, 101).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
    sk = TD.tdigest_agg(df, ["g"], "v", compression=100)
    vs, ws = F.col("vs"), F.col("ws")
    row = sk.select(
        TD.value_at_quantile(vs, ws, 0.5).alias("q50"),
        TD.values_at_quantiles(
            vs, ws, F.array(F.lit(0.1), F.lit(0.9))).alias("qs"),
        TD.quantile_at_value(vs, ws, 25.0).alias("r25"),
        TD.quantile_at_value(vs, ws, 1000.0).alias("r_oob"),
        TD.trimmed_mean(vs, ws, 0.25, 0.75).alias("tm"),
        TD.trimmed_mean(vs, ws, 0.0, 1.0).alias("tm_all"),
        TD.value_at_quantile(vs, TD.scale_tdigest(ws, 3.0), 0.5)
        .alias("q50_scaled"),
    ).collect()[0]
    assert row.q50 == 50.0
    assert row.qs == [10.0, 90.0]
    assert row.r25 == 0.25
    assert row.r_oob is None  # outside [min, max] -> NULL (reference)
    # mean of 26..75 = 50.5
    assert row.tm == pytest.approx(50.5, rel=1e-12)
    assert row.tm_all == pytest.approx(50.5, rel=1e-12)
    assert row.q50_scaled == row.q50  # quantiles scale-invariant


def test_tdigest_scale_negative_is_null(spark):
    from presto_spark.operators import tdigest as TD

    df = spark.range(1, 11).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
    sk = TD.tdigest_agg(df, ["g"], "v")
    row = sk.select(
        TD.scale_tdigest(F.col("ws"), -1.0).alias("s")).collect()[0]
    assert row.s is None


def test_tdigest_construct_roundtrip(spark):
    from presto_spark.operators import tdigest as TD

    df = spark.range(1, 21).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
    sk = TD.tdigest_agg(df, ["g"], "v")
    row = sk.select(
        TD.construct_tdigest(F.col("vs"), F.col("ws")).alias("c"),
        F.col("vs"), F.col("ws"),
    ).collect()[0]
    assert row.c.vs == row.vs and row.c.ws == row.ws


def test_empty_approx_set_merges_neutrally(spark):
    """empty_approx_set() (HyperLogLogFunctions.java): estimate 0 and
    a neutral element under merge."""
    from presto_spark.engine import Engine

    eng = Engine(spark)
    row = eng.sql(
        "SELECT hll_sketch_estimate(empty_approx_set()) AS zero, "
        "hll_sketch_estimate(hll_union(empty_approx_set(), "
        "  (SELECT hll_sketch_agg(id) FROM range(100)))) AS merged"
    ).collect()[0]
    assert row.zero == 0
    assert abs(row.merged - 100) <= 5


def test_theta_all_null_group_emits_empty_sketch(spark):
    from presto_spark.operators import theta as T

    df = spark.createDataFrame(
        [("a", 1), ("b", None)], "g string, v int")
    rows = {r.g: r.sketch for r in
            T.sketch_theta(df, ["g"], "v", k=16).collect()}
    assert len(rows["a"].hashes) == 1
    assert rows["b"].hashes == [] and rows["b"].theta == "g"
    est = spark.createDataFrame([(rows["b"],)], "s struct<hashes:array<string>,theta:string,k:int>") \
        .select(T.sketch_theta_estimate(F.col("s")).alias("e")).collect()[0].e
    assert est == 0.0


# ---- SFM sketches (SfmSketch.java; noisy.rst:100-200) ----

def test_sfm_nonprivate_build_and_estimate(spark):
    """epsilon = inf: deterministic FM bitmap; the Newton estimator
    (SfmSketch.cardinality:144-157) lands within the SFM envelope."""
    import math
    from presto_spark.operators import sfm

    df = spark.range(4000).withColumn("g", F.lit(1)) \
        .withColumn("v", F.col("id") % 800)
    row = sfm.noisy_approx_set_sfm(
        df, ["g"], "v", epsilon=math.inf, buckets=256, precision=16
    ).select(
        F.col("sfm.p").alias("p"),
        F.size("sfm.on_bits").alias("nb"),
        sfm.sfm_cardinality(F.col("sfm")).alias("est"),
    ).collect()[0]
    assert row.p == 0.0 and row.nb > 0
    assert abs(row.est - 800) / 800 < 0.15


def test_sfm_privacy_probability_and_flips(spark):
    """enablePrivacy flips each bit with p = 1/(e^eps + 1)
    (SfmSketch.java:228-236): stored p matches, and the number of ON
    bits moves toward the randomized-response expectation."""
    from presto_spark.operators import sfm

    df = spark.range(2000).withColumn("g", F.lit(1)) \
        .withColumn("v", F.col("id") % 500)
    eps = 1.0
    p = sfm.randomized_response_probability(eps)
    row = sfm.noisy_approx_set_sfm(
        df, ["g"], "v", epsilon=eps, buckets=128, precision=8, seed=3
    ).select(F.col("sfm.p").alias("p"),
             F.size("sfm.on_bits").alias("nb")).collect()[0]
    assert abs(row.p - p) < 1e-12
    # expected ON count = on0*(1-p) + (1024-on0)*p; on0 unknown but
    # bounded by bitmap; just check a nontrivial two-sided band
    assert 0 < row.nb < 128 * 8


def test_sfm_nonprivate_merge_is_or(spark):
    """Non-private merge = bitwise OR (mergeWith:361-364): merging the
    even/odd halves reproduces the whole-data sketch bit for bit, via
    BOTH the aggregate and the scalar combine."""
    import math
    from presto_spark.operators import sfm

    df = spark.range(3000).withColumn("g", (F.col("id") % 2).cast("int")) \
        .withColumn("v", F.col("id") % 600)
    whole = sfm.noisy_approx_set_sfm(df, ["g"], "v", math.inf, 128, 8) \
        .select("g", F.col("sfm").alias("w"))
    h1 = sfm.noisy_approx_set_sfm(
        df.filter("id < 1500"), ["g"], "v", math.inf, 128, 8)
    h2 = sfm.noisy_approx_set_sfm(
        df.filter("id >= 1500"), ["g"], "v", math.inf, 128, 8)
    agg = sfm.merge_sfm_nonprivate(h1.unionByName(h2), ["g"])
    ok = agg.join(whole, "g").select(
        (F.col("sfm.on_bits") == F.col("w.on_bits")).alias("ok")).collect()
    assert all(r.ok for r in ok) and len(ok) == 2
    pair = h1.select("g", F.col("sfm").alias("a")).join(
        h2.select("g", F.col("sfm").alias("b")), "g")
    ok2 = pair.join(whole, "g").select(
        (sfm.sfm_merge_scalar(F.col("a"), F.col("b"), 128, 8)["on_bits"]
         == F.col("w.on_bits")).alias("ok")).collect()
    assert all(r.ok for r in ok2)


def test_sfm_private_merge_probability_formula(spark):
    """Merged randomizedResponseProbability follows Theorem 4.8
    (mergeRandomizedResponseProbabilities:330-333)."""
    from presto_spark.operators import sfm

    df = spark.range(1000).withColumn("g", F.lit(1)) \
        .withColumn("v", F.col("id") % 300)
    a = sfm.noisy_approx_set_sfm(df, ["g"], "v", 3.0, 128, 8, seed=1) \
        .select("g", F.col("sfm").alias("a"))
    b = sfm.noisy_approx_set_sfm(df, ["g"], "v", 5.0, 128, 8, seed=2) \
        .select("g", F.col("sfm").alias("b"))
    got = a.join(b, "g").select(
        sfm.sfm_merge_scalar(F.col("a"), F.col("b"), 128, 8)["p"]
        .alias("p")).collect()[0].p
    p1 = sfm.randomized_response_probability(3.0)
    p2 = sfm.randomized_response_probability(5.0)
    assert abs(got - sfm.merge_randomized_response_probabilities(p1, p2)) \
        < 1e-12


def test_sfm_merge_nonprivate_rejects_private_inputs(spark):
    from presto_spark.operators import sfm

    df = spark.range(100).withColumn("g", F.lit(1)) \
        .withColumn("v", F.col("id"))
    priv = sfm.noisy_approx_set_sfm(df, ["g"], "v", 2.0, 64, 8)
    with pytest.raises(Exception, match="non-private"):
        sfm.merge_sfm_nonprivate(priv, ["g"]).collect()


def test_sfm_from_index_and_zeros(spark):
    """Pre-hashed build (addIndexAndZeros:128-139): locations land at
    index*precision + min(zeros, precision-1); out-of-range fails."""
    from presto_spark.operators import sfm

    df = spark.createDataFrame(
        [(1, 0, 0), (1, 0, 3), (1, 5, 12), (1, 63, 64)],
        "g int, idx int, zr int")
    row = sfm.noisy_approx_set_sfm_from_index_and_zeros(
        df, ["g"], "idx", "zr", epsilon=float("inf"),
        buckets=64, precision=8,
    ).select(F.col("sfm.on_bits").alias("ob")).collect()[0]
    assert row.ob == [0, 3, 5 * 8 + 7, 63 * 8 + 7]
    bad = spark.createDataFrame([(1, 64, 0)], "g int, idx int, zr int")
    with pytest.raises(Exception, match="out of range"):
        sfm.noisy_approx_set_sfm_from_index_and_zeros(
            bad, ["g"], "idx", "zr", float("inf"), 64, 8).collect()


def test_sfm_validation(spark):
    from presto_spark.operators import sfm

    df = spark.range(10).withColumn("g", F.lit(1)).withColumn("v", F.col("id"))
    with pytest.raises(ValueError, match="power of 2"):
        sfm.noisy_approx_set_sfm(df, ["g"], "v", float("inf"), buckets=100)
    with pytest.raises(ValueError, match="epsilon"):
        sfm.randomized_response_probability(-1.0)
    with pytest.raises(ValueError, match="cannot exceed"):
        sfm.noisy_approx_set_sfm(
            df, ["g"], "v", float("inf"), buckets=4096, precision=50)
