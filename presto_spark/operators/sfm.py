"""Noisy SFM sketch family: differentially-private distinct counting.

Reference surface (presto-main-base/.../operator/aggregation/
noisyaggregation/):

* ``noisy_approx_set_sfm(col, epsilon[, buckets[, precision]])`` —
  NoisyApproximateSetSfmAggregation.java; SfmSketchAggregationUtils
  .java:31-32 (DEFAULT_BUCKET_COUNT 4096, DEFAULT_PRECISION 24).
* ``noisy_approx_distinct_sfm(...)`` =
  cardinality(noisy_approx_set_sfm(...)) —
  NoisyApproximateDistinctCountSfmAggregation.java.
* ``noisy_approx_set_sfm_from_index_and_zeros(index, zeros, ...)`` —
  NoisyApproximateSetSfmFromIndexAndZerosAggregation.java.
* ``merge(sfmsketch)`` — SfmSketchMergeAggregation.java.
* ``cardinality(sfmsketch)`` — SfmSketch.java:144-157 (Newton's method
  on the pseudolikelihood).
* Docs: presto-docs/src/main/sphinx/functions/noisy.rst:100-200.

The SFM ("sketch-flip-merge", arXiv:2302.02056) sketch is a
Flajolet-Martin bitmap: bit (bucket, level) is ON when some input
hashed into ``bucket`` with ``level`` trailing zeros (capped at
precision-1).  Privacy = randomized response: every bit flips with
probability p = 1/(e^epsilon + 1) (SfmSketch.java:228-236); merge of
private sketches is the randomized bitwise combine of
SfmSketch.mergeWith:352-385; the estimator is Newton's method over
per-level on/off bit counts (logLikelihood* at :268-315).

Spark-first design.  A sketch is a plain STRUCT column::

    struct<on_bits: array<bigint>,  -- sorted ON locations
                                    -- (bucket * precision + level)
           p: double,               -- randomizedResponseProbability
           buckets: int, precision: int>

so building is one (group, location) distinct shuffle with map-side
combine, and the estimator is a fixed 60-step Newton fold over
``precision`` per-level counts — Column expressions end to end, no
UDFs.  The sparse ON-set representation prices storage in set bits,
not bitmap width.

Pinned deviations (COVERAGE.md sketch section):

* The hash is the top 60 bits of md5(value) (the khll.py convention —
  numeric order == hex-string order, DuckDB-replayable), not
  Murmur3Hash128.hash64 — sketch payloads are engine-specific
  throughout this repo.  ``precision + index_bits`` must fit 60 bits
  rather than the reference's 64.
* Randomized response draws come from a seeded xxhash64 of
  (seed, group, bit location) instead of SecureRandom — the flip
  DISTRIBUTION matches (each bit independently Bernoulli(p)), the
  stream does not; same class of deviation as noisy.py's seeded
  randn.  The zero-noise regime (epsilon = inf) is deterministic and
  exactly DuckDB-replayable, which is what the differential tests pin.

Scale notes: the non-private build shuffles only (group, location)
pairs — at most buckets×precision rows per group survive the
distinct, so output is sketch-sized regardless of input scale.
Enabling privacy evaluates one Bernoulli draw per bitmap position
(buckets×precision per group — the same O(bitmap) cost the reference
pays in enablePrivacy), map-side, no shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 4096  # SfmSketchAggregationUtils.java:31
DEFAULT_PRECISION = 24  # SfmSketchAggregationUtils.java:32
NON_PRIVATE_EPSILON = math.inf  # SfmSketch.java:53

_HASH_BITS = 60  # 15 hex digits of md5 — numeric order == string order


def randomized_response_probability(epsilon: float) -> float:
    """SfmSketch.getRandomizedResponseProbability:228-236."""
    if epsilon == NON_PRIVATE_EPSILON:
        return 0.0
    if epsilon <= 0:
        raise ValueError("epsilon must be greater than zero")
    return 1.0 / (math.exp(epsilon) + 1.0)


def merge_randomized_response_probabilities(p1: float, p2: float) -> float:
    """SfmSketch.mergeRandomizedResponseProbabilities:330-333."""
    return (p1 + p2 - 3 * p1 * p2) / (1 - 2 * p1 * p2)


def _index_bits(buckets: int) -> int:
    if buckets <= 0 or (buckets & (buckets - 1)) != 0:
        raise ValueError("numberOfBuckets must be a power of 2")
    return buckets.bit_length() - 1


def _uniform(*cols: Column) -> Column:
    """Deterministic Bernoulli source: xxhash64 → uniform [0, 1)."""
    h = F.xxhash64(*cols)
    # map signed 64-bit to [0, 1)
    return (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)


def _locations(value: Column, buckets: int, precision: int) -> Column:
    """(bucket * precision + level) for one value — SfmSketch.addHash:
    119-126 with the 60-bit md5 hash (module docstring)."""
    ib = _index_bits(buckets)
    if precision <= 0 or precision + ib > _HASH_BITS:
        raise ValueError(
            f"precision + indexBitLength cannot exceed {_HASH_BITS}")
    h = F.conv(F.substring(F.md5(value.cast("string").cast("binary")),
                           1, 15), 16, 10).cast("bigint")
    # sentinel 1-bit just above the hash suffix so an all-zero suffix
    # cannot flow into the bucket prefix (numberOfTrailingZeros:392-396)
    low = h.bitwiseOR(F.lit(1 << (_HASH_BITS - ib)).cast("bigint"))
    ntz = F.round(F.log2(low.bitwiseAND(-low).cast("double"))).cast("int")
    zeros = F.least(ntz, F.lit(precision - 1))
    # Integer shift, not double division: h is 60-bit, and routing it
    # through a double loses the low ~7 bits above 2^53 — hashes within
    # ~64 of a 2^(60-ib) boundary could round into the adjacent bucket
    # (ADVICE r7), quietly deviating from the exact/replayable regime.
    bucket = F.shiftright(h, _HASH_BITS - ib)
    return bucket * precision + zeros


def _privatize(
    on_bits: Column,
    p: float,
    buckets: int,
    precision: int,
    seed: int,
    salt: list[Column],
) -> Column:
    """enablePrivacy (SfmSketch.java:170-185): flip every bitmap
    position with probability p — ON survives w.p. 1-p, OFF turns on
    w.p. p.  One draw per position, seeded per (seed, salt, location)."""
    if p == 0.0:
        return on_bits
    all_locs = F.sequence(
        F.lit(0).cast("bigint"),
        F.lit(buckets * precision - 1).cast("bigint"))
    # ON bits survive w.p. 1-p, OFF bits flip on w.p. p.  array_except
    # is hash-based (linear in bitmap size) — a per-position
    # array_contains would make this quadratic.
    kept_on = F.filter(
        on_bits, lambda loc: _uniform(F.lit(seed), *salt, loc) >= p)
    flipped_on = F.filter(
        F.array_except(all_locs, on_bits),
        lambda loc: _uniform(F.lit(seed), *salt, loc) < p)
    return F.concat(kept_on, flipped_on)


def _sketch_struct(
    on_bits: Column, p: float, buckets: int, precision: int
) -> Column:
    return F.struct(
        on_bits.alias("on_bits"),
        F.lit(float(p)).alias("p"),
        F.lit(buckets).alias("buckets"),
        F.lit(precision).alias("precision"),
    )


def noisy_approx_set_sfm(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    epsilon: float,
    buckets: int = DEFAULT_BUCKETS,
    precision: int = DEFAULT_PRECISION,
    seed: int = 0,
) -> DataFrame:
    """One SFM sketch per group over ``value_col`` (NULLs ignored —
    the aggregate returns NULL only for all-NULL groups, spelled here
    as an empty-sketch row; noisy.rst:108-124).  Returns
    ``group_cols + [sfm]``."""
    p = randomized_response_probability(epsilon)
    ib = _index_bits(buckets)  # validates power-of-2 up front
    del ib
    locs = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols,
                _locations(F.col(value_col), buckets, precision)
                .alias("__loc"))
        .distinct()
    )
    built = locs.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__loc")).alias("__on"))
    salt = [F.col(g) for g in group_cols]
    private = built.select(
        *group_cols,
        F.sort_array(
            _privatize(F.col("__on"), p, buckets, precision, seed, salt)
        ).alias("__on"),
    )
    groups = df.select(*group_cols).distinct()
    empty = F.sort_array(_privatize(
        F.array().cast("array<bigint>"), p, buckets, precision, seed, salt))
    return groups.join(private, list(group_cols), "left").select(
        *group_cols,
        _sketch_struct(
            F.coalesce(F.col("__on"), empty), p, buckets, precision
        ).alias("sfm"),
    )


def noisy_approx_set_sfm_from_index_and_zeros(
    df: DataFrame,
    group_cols: list[str],
    index_col: str,
    zeros_col: str,
    epsilon: float,
    buckets: int,
    precision: int = DEFAULT_PRECISION,
    seed: int = 0,
) -> DataFrame:
    """Pre-hashed variant (NoisyApproximateSetSfmFromIndexAndZeros
    Aggregation.java; SfmSketch.addIndexAndZeros:128-139): callers
    supply the bucket index and trailing-zeros count directly —
    engine-independent payloads, unlike the hashed build."""
    p = randomized_response_probability(epsilon)
    _index_bits(buckets)
    idx = F.col(index_col).cast("bigint")
    zr = F.col(zeros_col).cast("bigint")
    checked = F.when(
        (idx >= 0) & (idx < buckets) & (zr >= 0) & (zr <= 64),
        idx * precision + F.least(zr, F.lit(precision - 1)).cast("bigint"),
    ).otherwise(F.raise_error(F.format_string(
        "index %s / zeros %s out of range", idx, zr)))
    locs = (
        df.filter(F.col(index_col).isNotNull() & F.col(zeros_col).isNotNull())
        .select(*group_cols, checked.alias("__loc"))
        .distinct()
    )
    built = locs.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__loc")).alias("__on"))
    salt = [F.col(g) for g in group_cols]
    return built.select(
        *group_cols,
        _sketch_struct(
            F.sort_array(_privatize(
                F.col("__on"), p, buckets, precision, seed, salt)),
            p, buckets, precision,
        ).alias("sfm"),
    )


def noisy_empty_approx_set_sfm(
    epsilon: float,
    buckets: int = DEFAULT_BUCKETS,
    precision: int = DEFAULT_PRECISION,
    seed: int = 0,
    salt: tuple = (),
) -> Column:
    """noisy_empty_approx_set_sfm(epsilon[, buckets[, precision]]) —
    NoisyEmptyApproxSetSfmAggregation surface (noisy.rst:160-168): an
    SFM sketch with no items, the coalesce() partner for the
    NULL-on-empty noisy aggregates.  Like the reference, privacy still
    applies — the empty bitmap is randomized-response flipped at
    p = 1/(e^epsilon + 1), so only the epsilon = inf regime is the
    all-zero bitmap.  Scalar Column constructor; pass ``salt`` columns
    to decorrelate per-row draws when attaching one per group."""
    p = randomized_response_probability(epsilon)
    _index_bits(buckets)
    on = F.sort_array(_privatize(
        F.array().cast("array<bigint>"), p, buckets, precision, seed,
        list(salt)))
    return _sketch_struct(on, p, buckets, precision)


def merge_sfm_nonprivate(
    df: DataFrame, group_cols: list[str], sfm_col: str = "sfm"
) -> DataFrame:
    """merge(sfmsketch) rollup for NON-private inputs (p = 0 for
    every sketch): the bitwise OR of SfmSketch.mergeWith:361-364,
    spelled as a distributed explode + distinct — shuffle carries only
    set-bit locations.  Mixed/private inputs need the randomized
    combine (``sfm_merge_scalar``); this aggregate raises if any input
    is private rather than silently degrade the privacy accounting."""
    s = F.col(sfm_col)
    caps = df.groupBy(*group_cols).agg(
        F.max(s["p"]).alias("__pmax"),
        F.min(s["buckets"]).alias("__b"), F.max(s["buckets"]).alias("__b2"),
        F.min(s["precision"]).alias("__pr"),
        F.max(s["precision"]).alias("__pr2"),
    )
    # The assert is load-bearing on the output columns (a free-standing
    # boolean would be pruned by the optimizer and never evaluated).
    ok = ((F.col("__pmax") == 0.0) & (F.col("__b") == F.col("__b2"))
          & (F.col("__pr") == F.col("__pr2")))
    fail = F.raise_error(F.lit(
        "merge_sfm_nonprivate: inputs must be non-private with "
        "matching buckets/precision"))
    checked = caps.select(
        *group_cols,
        F.when(ok, F.col("__b")).otherwise(fail.cast("int")).alias("__b"),
        F.when(ok, F.col("__pr")).otherwise(fail.cast("int")).alias("__pr"),
    )
    merged = (
        df.select(*group_cols, F.explode(s["on_bits"]).alias("__loc"))
        .distinct()
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("__loc")).alias("__on"))
    )
    return checked.join(merged, group_cols, "left").select(
        *group_cols,
        F.struct(
            F.coalesce(F.col("__on"), F.array().cast("array<bigint>"))
            .alias("on_bits"),
            F.lit(0.0).alias("p"),
            F.col("__b").alias("buckets"),
            F.col("__pr").alias("precision"),
        ).alias("sfm"),
    )


def sfm_merge_scalar(
    a: Column, b: Column, buckets: int, precision: int,
    seed: int = 0, salt: list[Column] | None = None,
) -> Column:
    """Pairwise randomized merge (SfmSketch.mergeWith:352-385): merged
    p from Theorem 4.8, per-position combine probability
    p + normalizer·(1 - 2p - normalizer·(1-p1-b1)(1-p2-b2)), drawn
    from the seeded hash source.  For p1 = p2 = 0 the probability
    collapses to exactly b1 OR b2 — the deterministic non-private
    merge — so this one expression is the whole reference combine.
    ``buckets``/``precision`` must match the stored sketches (Python
    ints so the position sequence is static)."""
    p1, p2 = a["p"], b["p"]
    p = (p1 + p2 - 3 * p1 * p2) / (1 - 2 * p1 * p2)
    normalizer = (1 - 2 * p) / ((1 - 2 * p1) * (1 - 2 * p2))
    all_locs = F.sequence(
        F.lit(0).cast("bigint"),
        F.lit(buckets * precision - 1).cast("bigint"))
    slt = salt if salt is not None else []

    # The combine probability depends only on the (bit1, bit2) pair, so
    # the bitmap partitions into four classes with one constant
    # probability each — hash-based array set ops keep the whole merge
    # linear in bitmap size (no per-position array_contains).
    def prob(b1: float, b2: float) -> Column:
        x = 1 - 2 * p - normalizer * (1 - p1 - b1) * (1 - p2 - b2)
        return F.least(F.lit(1.0), F.greatest(F.lit(0.0), p + normalizer * x))

    def drawn(locs: Column, pr: Column) -> Column:
        return F.filter(
            locs, lambda loc: _uniform(F.lit(seed), *slt, loc) < pr)

    both = F.array_intersect(a["on_bits"], b["on_bits"])
    only_a = F.array_except(a["on_bits"], b["on_bits"])
    only_b = F.array_except(b["on_bits"], a["on_bits"])
    neither = F.array_except(
        F.array_except(all_locs, a["on_bits"]), b["on_bits"])
    on = F.concat(
        drawn(both, prob(1.0, 1.0)),
        drawn(only_a, prob(1.0, 0.0)),
        drawn(only_b, prob(0.0, 1.0)),
        drawn(neither, prob(0.0, 0.0)),
    )
    return F.struct(
        F.array_sort(on).alias("on_bits"),
        p.alias("p"),
        a["buckets"].alias("buckets"),
        a["precision"].alias("precision"),
    )


def sfm_cardinality(sk: Column) -> Column:
    """cardinality(sfmsketch) (SfmSketch.java:144-157): Newton's method
    on the pseudolikelihood, 60 fixed iterations (the reference stops
    at |step| <= 0.1, typically < 40 iterations; extra steps at the
    optimum are no-ops).  Derivative terms mirror
    logLikelihoodTerm{First,Second}Derivative:281-315."""
    precision = sk["precision"]
    bkts = sk["buckets"].cast("double")
    p = sk["p"]
    c2 = 1.0 - 2.0 * p
    levels = F.sequence(F.lit(0), precision - 1)
    counts = F.transform(
        levels,
        lambda lv: F.size(
            F.filter(sk["on_bits"],
                     lambda bit: (bit % precision.cast("bigint"))
                     == lv.cast("bigint"))).cast("double"),
    )
    # L_l = log1p(-q_l) with q_l = 2^-(l+1) / buckets
    logs = F.transform(
        levels,
        lambda lv: F.log1p(-F.pow(F.lit(2.0), -(lv.cast("double") + 1.0))
                           / bkts),
    )
    # Let-binding: interpreted HOFs re-evaluate an inlined subtree at
    # every reference, so the per-level (count, log) pairs are
    # materialized ONCE through a lambda variable (zip + single-element
    # transform) before the 60-iteration Newton fold reads them.
    bound = F.zip_with(
        counts, logs,
        lambda c, ll: F.struct(c.alias("c"), ll.alias("l")))

    def newton(cl: Column) -> Column:
        def d1_d2(g: Column) -> Column:
            def per_level(e):
                c_on, ll = e["c"], e["l"]
                en = F.exp(g * ll)
                c1on = 1.0 - p
                t_on = ll * (1.0 - c1on / (c1on - c2 * en))
                t_off = ll * (1.0 - p / (p + c2 * en))
                t2_on = (-c1on * c2 * ll * ll * en
                         / ((c1on - c2 * en) * (c1on - c2 * en)))
                t2_off = (p * c2 * ll * ll * en
                          / ((p + c2 * en) * (p + c2 * en)))
                return F.struct(
                    (c_on * t_on + (bkts - c_on) * t_off).alias("d1"),
                    (c_on * t2_on + (bkts - c_on) * t2_off).alias("d2"),
                )

            return F.aggregate(
                F.transform(cl, per_level),
                F.struct(F.lit(0.0).alias("d1"), F.lit(0.0).alias("d2")),
                lambda acc, t: F.struct(
                    (acc["d1"] + t["d1"]).alias("d1"),
                    (acc["d2"] + t["d2"]).alias("d2")),
            )

        return F.aggregate(
            F.sequence(F.lit(1), F.lit(60)),
            F.lit(1.0),
            lambda g, _: g - d1_d2(g)["d1"] / d1_d2(g)["d2"],
        )

    guess = F.element_at(F.transform(F.array(bound), newton), 1)
    return F.greatest(F.lit(0).cast("bigint"), F.round(guess).cast("bigint"))
