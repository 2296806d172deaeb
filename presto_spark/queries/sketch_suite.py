"""Sketch/approximate-aggregate queries with envelope or exact oracles.

Sketch payloads are engine-specific (DataSketches vs Presto's Airlift
HLL), so cross-engine checks assert the documented error envelope —
the reference's own strategy
(TestApproximateCountDistinctAggregation.java asserts bounds, not
bytes).  Compositions that are exact (top-k frequency, width-bucket
histogram) get full value oracles.
"""

from pyspark.sql import functions as F

from presto_spark.operators import sketches
from presto_spark.queries.base import prepare, register


@register(
    "sketch_hll_mergeable_rollup",
    oracle="SELECT true AS partial_ok, true AS merged_ok",
    doc="approx_set per nation → merge() rollup to region "
        "(ApproximateSetAggregation.java + MergeHyperLogLogAggregation"
        ".java): the two-level mergeable-sketch pattern. Asserts the "
        "merged estimate lands within 5% of the exact region-level "
        "distinct count AND that merging partials equals sketching "
        "directly — without rescanning raw rows for the rollup.",
    tags=("sketch", "agg"),
)
def sketch_hll_mergeable_rollup(spark, sf_dir):
    prepare(spark, sf_dir)
    cust = spark.table("customer").join(
        spark.table("nation"),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    # Level 1: one sketch per nation (the stored partial);
    # Level 2: merge partials up to region — no raw-row rescan.
    partials = (
        cust.groupBy("n_nationkey", "n_regionkey")
        .agg(sketches.approx_set("c_custkey").alias("nation_sketch"))
        .groupBy("n_regionkey")
        .agg(sketches.merge_hll("nation_sketch").alias("region_sketch"))
        .select(
            "n_regionkey",
            sketches.hll_cardinality("region_sketch").alias("est"),
        )
    )
    exact = cust.groupBy("n_regionkey").agg(
        F.countDistinct("c_custkey").alias("ed")
    )
    direct = cust.groupBy("n_regionkey").agg(
        sketches.hll_cardinality(
            sketches.approx_set("c_custkey")
        ).alias("direct_est")
    )
    joined = partials.join(exact, "n_regionkey").join(direct, "n_regionkey")
    return joined.agg(
        F.bool_and(
            F.abs(F.col("est") - F.col("ed")) <= 0.05 * F.col("ed")
        ).alias("partial_ok"),
        F.bool_and(
            F.abs(F.col("est") - F.col("direct_est")) <= 0.01 * F.col("direct_est")
        ).alias("merged_ok"),
    )


@register(
    "sketch_approx_most_frequent",
    oracle="""
    WITH counted AS (
      SELECT l_returnflag, l_suppkey AS v, count(*) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT l_returnflag, v, n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, v ASC) AS rk
      FROM counted
    )
    SELECT l_returnflag,
           CAST(sum(n) AS BIGINT) AS topk_total,
           CAST(sum(v * rk) AS BIGINT) AS topk_checksum
    FROM ranked WHERE rk <= 3
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_most_frequent(3, l_suppkey) per returnflag "
        "(approxmostfrequent/): two-level count + per-group top-k slice; "
        "checked exactly via count/rank checksum (deterministic "
        "count-desc, value-asc tie-break).",
    tags=("sketch", "agg"),
)
def sketch_approx_most_frequent(spark, sf_dir):
    prepare(spark, sf_dir)
    li = spark.table("lineitem")
    amf = sketches.approx_most_frequent(li, ["l_returnflag"], "l_suppkey", 3)
    entries = F.map_entries("freq")  # preserves insertion (rank) order
    return (
        amf.select(
            "l_returnflag",
            F.aggregate(
                entries, F.lit(0).cast("long"), lambda acc, e: acc + e["value"]
            ).alias("topk_total"),
            F.aggregate(
                F.zip_with(
                    entries,
                    F.sequence(F.lit(1), F.size(entries)),
                    lambda e, i: e["key"] * i,
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("topk_checksum"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "sketch_numeric_histogram",
    oracle="""
    WITH b AS (
      SELECT CAST(CASE WHEN l_quantity < 0.0 THEN 0
                       WHEN l_quantity >= 50.0 THEN 11
                       ELSE floor(l_quantity / 5.0) + 1 END AS BIGINT) AS bucket
      FROM lineitem
    )
    SELECT bucket, count(*) AS n,
           CAST((bucket - 1) * 5.0 AS DOUBLE) AS lo_edge,
           CAST(bucket * 5.0 AS DOUBLE) AS hi_edge
    FROM b GROUP BY 1 ORDER BY 1
    """,
    doc="numeric_histogram(10, l_quantity) with fixed [0,50) bounds "
        "(NumericHistogramAggregation analog): width_bucket + groupBy — "
        "map-side bucketing, one shuffle, exact oracle.",
    tags=("sketch", "agg", "bench"),
)
def sketch_numeric_histogram(spark, sf_dir):
    prepare(spark, sf_dir)
    li = spark.table("lineitem")
    h = sketches.numeric_histogram(li, [], "l_quantity", 10, 0.0, 50.0)
    return (
        h.select(
            "bucket", "n",
            F.round("lo_edge", 3).alias("lo_edge"),
            F.round("hi_edge", 3).alias("hi_edge"),
        )
        .orderBy("bucket")
    )


@register(
    "sketch_approx_percentile_groups",
    oracle="""
    SELECT l_returnflag,
           CASE WHEN ap BETWEEN p45 AND p55 THEN true ELSE false END AS p50_ok,
           CASE WHEN ap90 BETWEEN p85 AND p95 THEN true ELSE false END AS p90_ok
    FROM (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5) AS ap,
             quantile_cont(l_extendedprice, 0.9) AS ap90,
             quantile_cont(l_extendedprice, 0.45) AS p45,
             quantile_cont(l_extendedprice, 0.55) AS p55,
             quantile_cont(l_extendedprice, 0.85) AS p85,
             quantile_cont(l_extendedprice, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag
    ) t
    ORDER BY l_returnflag
    """,
    doc="approx_percentile(x, [0.5, 0.9]) per group "
        "(qdigest-backed in Presto; KLL-style mergeable summaries in "
        "Spark): estimates must land inside a +/-5-percentile band of "
        "the exact quantiles.",
    tags=("sketch", "agg"),
)
def sketch_approx_percentile_groups(spark, sf_dir):
    prepare(spark, sf_dir)
    li = spark.table("lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.45)").alias("p45"),
        F.expr("percentile(l_extendedprice, 0.55)").alias("p55"),
        F.expr("percentile(l_extendedprice, 0.85)").alias("p85"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    approx = li.groupBy("l_returnflag").agg(
        sketches.approx_percentile("l_extendedprice", 0.5).alias("ap"),
        sketches.approx_percentile("l_extendedprice", 0.9).alias("ap90"),
    )
    return (
        approx.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("ap").between(F.col("p45"), F.col("p55")).alias("p50_ok"),
            F.col("ap90").between(F.col("p85"), F.col("p95")).alias("p90_ok"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "sketch_quantile_mergeable_rollup",
    oracle="""
    SELECT l_returnflag, true AS q25_ok, true AS q50_ok, true AS q75_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Mergeable quantile sketches (QuantileDigestAggregationFunction"
        ".java qdigest_agg + MergeQuantileDigestFunction + "
        "QuantileDigestFunctions.java value_at_quantile): level-1 "
        "sketch per (returnflag, month) via sharded applyInPandas, "
        "level-2 merge to returnflag WITHOUT rescanning raw rows, then "
        "JVM-side value_at_quantile. Envelope oracle: each estimate "
        "must land between the exact q∓0.03 percentiles (rank-error "
        "band; sketch bytes are engine-specific, as with HLL).",
    tags=("sketch", "agg", "bench"),
)
def sketch_quantile_mergeable_rollup(spark, sf_dir):
    from presto_spark.operators import qsketch

    prepare(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_returnflag",
        F.month("l_shipdate").alias("mo"),
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    # Level 1: stored partial per (returnflag, month) — the sketch table a
    # dashboard would persist daily.
    partials = qsketch.quantile_sketch_agg(
        li, ["l_returnflag", "mo"], "price", k=512, n_shards=8
    )
    # Level 2: roll months up to returnflag, sketch-sized input only.
    merged = qsketch.merge_quantile_sketches(partials, ["l_returnflag"], k=512)
    est = merged.select(
        "l_returnflag",
        qsketch.sketch_quantiles_col([0.25, 0.5, 0.75]).alias("est"),
    )
    # Band edges via percentile_approx at accuracy 10000 (rank error
    # 1e-4, negligible against the ±0.03 band) — the exact percentile()
    # implementation sorts whole groups and dominated the query's cost.
    exact = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_approx(price,"
            " array(0.22,0.28,0.47,0.53,0.72,0.78), 10000)"
        ).alias("band")
    )
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            ((F.col("est")[0] >= F.col("band")[0])
             & (F.col("est")[0] <= F.col("band")[1])).alias("q25_ok"),
            ((F.col("est")[1] >= F.col("band")[2])
             & (F.col("est")[1] <= F.col("band")[3])).alias("q50_ok"),
            ((F.col("est")[2] >= F.col("band")[4])
             & (F.col("est")[2] <= F.col("band")[5])).alias("q75_ok"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "sketch_noisy_gaussian_envelope",
    oracle="SELECT true AS count_ok, true AS sum_ok, true AS avg_ok, "
           "true AS clip_ok",
    doc="Noisy gaussian aggregates (noisyaggregation/"
        "NoisyCountAggregationUtils.java computeNoisyCount, "
        "NoisySumGaussianClippingAggregation.java): per-returnflag noisy "
        "count/sum/avg with noise_scale sigma must land within 8 sigma "
        "of the exact values (P(miss) ~ 1e-15), counts clamp at zero, "
        "and clipping bounds the sum by clip*count. Noise is inherently "
        "random so the contract is the envelope, not the value — same "
        "protocol as the HLL envelope queries.",
    tags=("sketch", "agg", "noisy"),
)
def sketch_noisy_gaussian_envelope(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import noisy

    li = spark.table("lineitem")
    scale = 100.0
    nc = noisy.noisy_count_gaussian(
        li, "l_orderkey", scale, group_by=("l_returnflag",))
    ns = noisy.noisy_sum_gaussian(
        li, "l_quantity", scale, group_by=("l_returnflag",))
    na = noisy.noisy_avg_gaussian(
        li, "l_quantity", 0.5, group_by=("l_returnflag",))
    # clipping to [0, 1] bounds the sum by the row count
    nclip = noisy.noisy_sum_gaussian(
        li, "l_quantity", scale, lower=0.0, upper=1.0,
        group_by=("l_returnflag",), alias="noisy_clip")
    exact = li.groupBy("l_returnflag").agg(
        F.count("l_orderkey").alias("c"),
        F.sum(F.col("l_quantity").cast("double")).alias("s"),
        F.avg(F.col("l_quantity").cast("double")).alias("a"),
    )
    j = (exact.join(nc, "l_returnflag").join(ns, "l_returnflag")
         .join(na, "l_returnflag").join(nclip, "l_returnflag"))
    return j.agg(
        F.bool_and(
            (F.abs(F.col("noisy_count") - F.col("c")) <= 8 * scale)
            & (F.col("noisy_count") >= 0)).alias("count_ok"),
        F.bool_and(
            F.abs(F.col("noisy_sum") - F.col("s")) <= 8 * scale
        ).alias("sum_ok"),
        F.bool_and(F.abs(F.col("noisy_avg") - F.col("a")) <= 8 * 0.5)
        .alias("avg_ok"),
        F.bool_and(
            F.col("noisy_clip") <= F.col("c") + 8 * scale).alias("clip_ok"),
    )


_SETDIGEST_EXACT_ORACLE = """
WITH h AS (
  SELECT DISTINCT o_orderpriority AS g,
         md5(CAST(o_custkey % 400 AS VARCHAR)) AS h
  FROM orders
),
n AS (SELECT g, count(*) AS nd FROM h GROUP BY g),
pairs AS (SELECT a.g AS pa, b.g AS pb FROM n a JOIN n b ON a.g < b.g),
inter AS (
  SELECT x.g AS pa, y.g AS pb, count(*) AS ic
  FROM h x JOIN h y ON x.h = y.h AND x.g < y.g
  GROUP BY x.g, y.g
),
u AS (
  SELECT p.pa, p.pb, h.h
  FROM pairs p JOIN h ON h.g IN (p.pa, p.pb)
  GROUP BY p.pa, p.pb, h.h
),
ranked AS (
  SELECT pa, pb, h,
         row_number() OVER (PARTITION BY pa, pb ORDER BY h) AS rk
  FROM u
),
j AS (
  SELECT r.pa, r.pb,
         CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM h x
                                    WHERE x.g = r.pa AND x.h = r.h)
                        AND EXISTS (SELECT 1 FROM h y
                                    WHERE y.g = r.pb AND y.h = r.h)
                  THEN 1 ELSE 0 END) AS BIGINT) AS jacc_num
  FROM ranked r
  JOIN n na ON na.g = r.pa
  JOIN n nb ON nb.g = r.pb
  WHERE r.rk <= least(na.nd, nb.nd)
  GROUP BY r.pa, r.pb
)
SELECT p.pa AS pa, p.pb AS pb,
       CAST(na.nd AS BIGINT) AS card_a,
       CAST(nb.nd AS BIGINT) AS card_b,
       CAST(i.ic AS BIGINT) AS inter_exact,
       j.jacc_num,
       CAST(least(na.nd, nb.nd) AS BIGINT) AS jacc_den,
       true AS merge_ok
FROM pairs p
JOIN n na ON na.g = p.pa
JOIN n nb ON nb.g = p.pb
JOIN inter i ON i.pa = p.pa AND i.pb = p.pb
JOIN j ON j.pa = p.pa AND j.pb = p.pb
ORDER BY pa, pb
"""


@register(
    "sketch_setdigest_exact_ops",
    oracle=_SETDIGEST_EXACT_ORACLE,
    doc="make_set_digest / cardinality / intersection_cardinality / "
        "jaccard_index in the exact regime (SetDigest.java:142-163: a "
        "digest below max_hashes retained hashes IS the set). Digests "
        "per o_orderpriority over o_custkey%400; every pairwise "
        "cardinality, exact intersection, and the bottom-k jaccard "
        "estimator (SetDigest.java:166-184) replayed bit-for-bit by "
        "DuckDB over the same md5 hash ordering; jaccard emitted as an "
        "integer num/den pair so no float formatting touches the hash. "
        "merge_ok asserts merge_set_digest over (priority, orderstatus) "
        "partials reproduces the directly-built digest exactly "
        "(SetDigest.java:209-221 mergeWith).",
    tags=("sketch", "agg", "setdigest"),
)
def sketch_setdigest_exact_ops(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import setdigest

    vals = spark.table("orders").select(
        "o_orderpriority",
        "o_orderstatus",
        (F.col("o_custkey") % 400).cast("string").alias("v"),
    )
    dig = setdigest.make_set_digest(
        vals, ["o_orderpriority"], "v", max_hashes=4096)
    # merge path: partials per (priority, status) rolled up to priority
    partials = setdigest.make_set_digest(
        vals, ["o_orderpriority", "o_orderstatus"], "v", max_hashes=4096)
    merged = setdigest.merge_set_digests(
        partials, ["o_orderpriority"], "digest")
    a = dig.select(
        F.col("o_orderpriority").alias("pa"), F.col("digest").alias("da"))
    b = dig.select(
        F.col("o_orderpriority").alias("pb"), F.col("digest").alias("db"))
    pairs = a.join(F.broadcast(b), F.col("pa") < F.col("pb"))
    da, db = F.col("da"), F.col("db")
    k = F.least(F.size(da["hashes"]), F.size(db["hashes"]))
    bottom_k = F.slice(
        F.array_sort(F.array_union(da["hashes"], db["hashes"])), F.lit(1), k)
    jacc_num = F.size(F.filter(
        bottom_k,
        lambda h: F.array_contains(da["hashes"], h)
        & F.array_contains(db["hashes"], h)))
    merge_ok_df = (
        dig.alias("d")
        .join(merged.alias("m"), "o_orderpriority")
        .select(
            ((F.col("d.digest.hashes") == F.col("m.digest.hashes"))
             & (F.col("d.digest.counts") == F.col("m.digest.counts"))
             & (F.col("d.digest.exact") == F.col("m.digest.exact"))
             ).alias("ok"))
        .agg(F.bool_and("ok").alias("merge_ok"))
    )
    return (
        pairs.select(
            "pa", "pb",
            setdigest.cardinality(da).alias("card_a"),
            setdigest.cardinality(db).alias("card_b"),
            setdigest.intersection_cardinality(da, db).alias("inter_exact"),
            jacc_num.cast("long").alias("jacc_num"),
            k.cast("long").alias("jacc_den"),
        )
        .crossJoin(F.broadcast(merge_ok_df))
        .orderBy("pa", "pb")
    )


_SETDIGEST_MINHASH_ORACLE = """
WITH h AS (
  SELECT DISTINCT o_orderpriority AS g,
         md5(CAST(o_custkey % 400 AS VARCHAR)) AS h
  FROM orders
),
ranked_h AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
  FROM h
),
kept AS (SELECT g, h FROM ranked_h WHERE rk <= 128),
ksz AS (SELECT g, count(*) AS sz FROM kept GROUP BY g),
pairs AS (SELECT a.g AS pa, b.g AS pb FROM ksz a JOIN ksz b ON a.g < b.g),
u AS (
  SELECT p.pa, p.pb, kept.h
  FROM pairs p JOIN kept ON kept.g IN (p.pa, p.pb)
  GROUP BY p.pa, p.pb, kept.h
),
ranked_u AS (
  SELECT pa, pb, h,
         row_number() OVER (PARTITION BY pa, pb ORDER BY h) AS rk
  FROM u
),
j AS (
  SELECT r.pa, r.pb,
         CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM kept x
                                    WHERE x.g = r.pa AND x.h = r.h)
                        AND EXISTS (SELECT 1 FROM kept y
                                    WHERE y.g = r.pb AND y.h = r.h)
                  THEN 1 ELSE 0 END) AS BIGINT) AS jacc_num
  FROM ranked_u r
  JOIN ksz sa ON sa.g = r.pa
  JOIN ksz sb ON sb.g = r.pb
  WHERE r.rk <= least(sa.sz, sb.sz)
  GROUP BY r.pa, r.pb
)
SELECT p.pa AS pa, p.pb AS pb, j.jacc_num AS jacc_num,
       CAST(least(sa.sz, sb.sz) AS BIGINT) AS jacc_den,
       true AS card_ok, true AS inter_ok
FROM pairs p
JOIN ksz sa ON sa.g = p.pa
JOIN ksz sb ON sb.g = p.pb
JOIN j ON j.pa = p.pa AND j.pb = p.pb
ORDER BY pa, pb
"""


@register(
    "sketch_setdigest_minhash_envelope",
    oracle=_SETDIGEST_MINHASH_ORACLE,
    doc="SetDigest in the truncated (approximate) regime: max_hashes=128 "
        "< distinct values, so cardinality falls back to the HLL "
        "(SetDigest.java:150-156) and intersection_cardinality to "
        "round(jaccard * |A∪B|_hll) clamped by min(|A|,|B|) "
        "(SetDigestFunctions.java:47-67). The bottom-k jaccard estimator "
        "stays deterministic given the hash order, so DuckDB replays "
        "jacc_num/jacc_den exactly over the same bottom-128 md5 sets; "
        "the HLL-backed outputs are envelope-checked (5% cardinality, "
        "25% intersection) against exact values computed engine-side.",
    tags=("sketch", "agg", "setdigest"),
)
def sketch_setdigest_minhash_envelope(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import setdigest

    vals = spark.table("orders").select(
        "o_orderpriority",
        (F.col("o_custkey") % 400).cast("string").alias("v"),
    )
    dig = setdigest.make_set_digest(
        vals, ["o_orderpriority"], "v", max_hashes=128)
    exact_sets = vals.distinct()
    exact_n = exact_sets.groupBy("o_orderpriority").agg(
        F.count("*").alias("nd"))
    exact_inter = (
        exact_sets.alias("x")
        .join(exact_sets.alias("y"),
              (F.col("x.v") == F.col("y.v"))
              & (F.col("x.o_orderpriority") < F.col("y.o_orderpriority")))
        .groupBy(F.col("x.o_orderpriority").alias("pa"),
                 F.col("y.o_orderpriority").alias("pb"))
        .agg(F.count("*").alias("true_inter"))
    )
    a = dig.select(
        F.col("o_orderpriority").alias("pa"), F.col("digest").alias("da"))
    b = dig.select(
        F.col("o_orderpriority").alias("pb"), F.col("digest").alias("db"))
    da, db = F.col("da"), F.col("db")
    k = F.least(F.size(da["hashes"]), F.size(db["hashes"]))
    bottom_k = F.slice(
        F.array_sort(F.array_union(da["hashes"], db["hashes"])), F.lit(1), k)
    jacc_num = F.size(F.filter(
        bottom_k,
        lambda h: F.array_contains(da["hashes"], h)
        & F.array_contains(db["hashes"], h)))
    pairs = (
        a.join(F.broadcast(b), F.col("pa") < F.col("pb"))
        .join(exact_inter, ["pa", "pb"])
        .join(exact_n.select(F.col("o_orderpriority").alias("pa"),
                             F.col("nd").alias("nd_a")), "pa")
        .join(exact_n.select(F.col("o_orderpriority").alias("pb"),
                             F.col("nd").alias("nd_b")), "pb")
    )
    return (
        pairs.select(
            "pa", "pb",
            jacc_num.cast("long").alias("jacc_num"),
            k.cast("long").alias("jacc_den"),
            ((F.abs(setdigest.cardinality(da) - F.col("nd_a"))
              <= 0.05 * F.col("nd_a"))
             & (F.abs(setdigest.cardinality(db) - F.col("nd_b"))
                <= 0.05 * F.col("nd_b"))).alias("card_ok"),
            (F.abs(setdigest.intersection_cardinality(da, db)
                   - F.col("true_inter"))
             <= 0.25 * F.col("true_inter")).alias("inter_ok"),
        )
        .orderBy("pa", "pb")
    )


_KHLL_ORACLE = """
WITH per_val AS (
  SELECT o_orderpriority AS g, o_orderdate AS v,
         count(DISTINCT o_custkey) AS u
  FROM orders GROUP BY 1, 2
),
n AS (SELECT g, count(*) AS nd FROM per_val GROUP BY g),
grid AS (
  SELECT n.g, n.nd, b.bucket
  FROM n CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6]) AS bucket) b
),
counts AS (
  SELECT g, least(u, 6) AS bucket, count(*) AS c
  FROM per_val GROUP BY 1, 2
),
reident AS (
  SELECT g,
         CAST(sum(CASE WHEN u <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS rp
  FROM per_val GROUP BY g
)
SELECT grid.g AS g,
       CAST(grid.bucket AS BIGINT) AS bucket,
       printf('%.6f', CAST(coalesce(counts.c, 0) AS DOUBLE) / grid.nd)
         AS frac,
       CAST(grid.nd AS BIGINT) AS khll_card,
       printf('%.6f', reident.rp) AS reident_p2
FROM grid
LEFT JOIN counts ON counts.g = grid.g AND counts.bucket = grid.bucket
JOIN reident ON reident.g = grid.g
ORDER BY g, bucket
"""


@register(
    "sketch_khll_privacy_audit",
    oracle=_KHLL_ORACLE,
    doc="KHyperLogLog privacy audit (type/khyperloglog/KHyperLogLog"
        ".java, khyperloglog.rst): khyperloglog_agg(o_orderdate, "
        "o_custkey) per priority, then uniqueness_distribution "
        "(histogramSize=6, zero-filled buckets, KHyperLogLog.java:"
        "312-327), reidentification_potential(threshold=2, :297-305) "
        "and cardinality (exact regime — distinct dates < max_hashes). "
        "Per-value uii cardinalities sit in the DataSketches "
        "coupon-exact range, so DuckDB's exact per-date distinct-"
        "customer counts reproduce every fraction bit-for-bit.",
    tags=("sketch", "agg", "khll", "bench"),
)
def sketch_khll_privacy_audit(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import khll as K

    dig = K.khyperloglog_agg(
        spark.table("orders"), ["o_orderpriority"], "o_orderdate",
        "o_custkey")
    d = F.col("khll")
    per_group = dig.select(
        F.col("o_orderpriority").alias("g"),
        F.explode(K.uniqueness_distribution(d, histogram_size=6)).alias(
            "bucket", "frac_raw"),
        K.cardinality(d).alias("khll_card"),
        K.reidentification_potential(d, 2).alias("rp"),
    )
    return per_group.select(
        "g",
        "bucket",
        F.format_string("%.6f", F.col("frac_raw")).alias("frac"),
        "khll_card",
        F.format_string("%.6f", F.col("rp")).alias("reident_p2"),
    ).orderBy("g", "bucket")


_THETA_EXACT_ORACLE = """
WITH v AS (
  SELECT DISTINCT o_orderpriority AS g, o_custkey % 2000 AS v FROM orders
),
n AS (SELECT g, count(*) AS nd FROM v GROUP BY g),
pairs AS (SELECT a.g AS pa, b.g AS pb FROM n a JOIN n b ON a.g < b.g),
i AS (
  SELECT p.pa, p.pb, count(*) AS ic
  FROM pairs p
  JOIN v a ON a.g = p.pa
  JOIN v b ON b.g = p.pb AND b.v = a.v
  GROUP BY p.pa, p.pb
)
SELECT p.pa AS pa, p.pb AS pb,
       CAST(na.nd AS BIGINT) AS est_a,
       CAST(nb.nd AS BIGINT) AS est_b,
       CAST(na.nd + nb.nd - COALESCE(i.ic, 0) AS BIGINT) AS union_est,
       CAST(COALESCE(i.ic, 0) AS BIGINT) AS inter_est,
       CAST(na.nd - COALESCE(i.ic, 0) AS BIGINT) AS anotb_est,
       true AS merge_ok
FROM pairs p
JOIN n na ON na.g = p.pa
JOIN n nb ON nb.g = p.pb
LEFT JOIN i ON i.pa = p.pa AND i.pb = p.pb
ORDER BY pa, pb
"""


@register(
    "sketch_theta_exact_ops",
    oracle=_THETA_EXACT_ORACLE,
    doc="sketch_theta / estimate / union / intersect / a-not-b in the "
        "exact regime (theta=1: the retained set IS the set — "
        "ThetaSketchAggregationFunction.java builds, "
        "ThetaSketchFunctions.java:39 estimates). Sketches per "
        "o_orderpriority over o_custkey%2000 at k=4096 (the bounded "
        "domain keeps every group exact at every SF): every pairwise "
        "estimate and set operation must "
        "equal DuckDB's exact distinct/overlap counts. merge_ok "
        "asserts the union rollup of (priority, orderstatus) partials "
        "reproduces the directly-built sketch exactly (the "
        "aggregation's combine step).",
    tags=("sketch", "agg", "theta"),
)
def sketch_theta_exact_ops(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import theta

    orders = spark.table("orders").withColumn(
        "__v", F.col("o_custkey") % 2000)
    dig = theta.sketch_theta(orders, ["o_orderpriority"], "__v", k=4096)
    partials = theta.sketch_theta(
        orders, ["o_orderpriority", "o_orderstatus"], "__v", k=4096)
    merged = theta.merge_theta_sketches(
        partials, ["o_orderpriority"], "sketch")
    merge_ok_df = (
        dig.alias("d")
        .join(merged.alias("m"), "o_orderpriority")
        .select(
            ((F.col("d.sketch.hashes") == F.col("m.sketch.hashes"))
             & (F.col("d.sketch.theta") == F.col("m.sketch.theta"))
             ).alias("ok"))
        .agg(F.bool_and("ok").alias("merge_ok"))
    )
    a = dig.select(
        F.col("o_orderpriority").alias("pa"), F.col("sketch").alias("sa"))
    b = dig.select(
        F.col("o_orderpriority").alias("pb"), F.col("sketch").alias("sb"))
    sa, sb = F.col("sa"), F.col("sb")
    return (
        a.join(F.broadcast(b), F.col("pa") < F.col("pb"))
        .select(
            "pa", "pb",
            theta.sketch_theta_estimate(sa).cast("long").alias("est_a"),
            theta.sketch_theta_estimate(sb).cast("long").alias("est_b"),
            theta.sketch_theta_estimate(
                theta.theta_union(sa, sb)).cast("long").alias("union_est"),
            theta.sketch_theta_estimate(
                theta.theta_intersect(sa, sb)).cast("long").alias("inter_est"),
            theta.sketch_theta_estimate(
                theta.theta_a_not_b(sa, sb)).cast("long").alias("anotb_est"),
        )
        .crossJoin(F.broadcast(merge_ok_df))
        .orderBy("pa", "pb")
    )


_THETA_ENVELOPE_ORACLE = """
WITH h AS (
  SELECT DISTINCT o_orderpriority AS g,
         md5(CAST(o_custkey AS VARCHAR)) AS h
  FROM orders
),
ranked AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
  FROM h
),
n AS (SELECT g, count(*) AS nd FROM h GROUP BY g)
SELECT n.g AS g,
       CAST(least(n.nd, 256) AS BIGINT) AS retained,
       COALESCE((SELECT r.h FROM ranked r WHERE r.g = n.g AND r.rk = 257),
                'g') AS theta_hash,
       true AS within_3se,
       true AS summary_ok
FROM n
ORDER BY g
"""


@register(
    "sketch_theta_estimate_envelope",
    oracle=_THETA_ENVELOPE_ORACLE,
    doc="sketch_theta in the estimating regime (k=256 < group "
        "cardinality): DuckDB replays the retained-entry count and "
        "the promoted theta hash (the (k+1)-th smallest md5) "
        "bit-for-bit over the same hash ordering, and the estimate "
        "retained/theta must land within 3/sqrt(k) of the exact "
        "distinct count (ThetaSketchFunctions.java:55-70 summary; "
        "bounds strategy per the reference's own envelope tests). "
        "summary_ok asserts sketch_theta_summary internal consistency "
        "(lower <= estimate <= upper, retained matches).",
    tags=("sketch", "agg", "theta", "bench"),
)
def sketch_theta_estimate_envelope(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import theta

    orders = spark.table("orders")
    dig = theta.sketch_theta(orders, ["o_orderpriority"], "o_custkey", k=256)
    # r15 (guide §2.4 — share one exchange): the exact distinct count
    # is derived from the IDENTICAL distinct-hash subtree the sketch
    # builds, so Spark reuses that exchange instead of re-scanning
    # orders for a second countDistinct.  count(distinct md5(custkey))
    # == count(distinct custkey) — the full 128-bit md5 makes a
    # collision (the only way a value could differ) cryptographically
    # impossible, and the oracle re-proves the booleans every run.
    exact = (
        orders.filter(F.col("o_custkey").isNotNull())
        .select(
            "o_orderpriority",
            theta._portable_hash(F.col("o_custkey")).alias("__h"))
        .distinct()
        .groupBy("o_orderpriority").agg(F.count("*").alias("nd")))
    s = F.col("sketch")
    summ = theta.sketch_theta_summary(s)
    # LEFT join + nd coalesce (ADVICE r15): the null-filtered exact
    # side loses a group whose custkeys are ALL NULL, but the sketch
    # side always emits every group — restore it with nd=0, exactly
    # what the pre-r15 countDistinct produced, WITHOUT touching the
    # filtered-distinct subtree (it must stay bit-identical to the
    # sketch's own so AQE reuses the exchange).  Benign on TPC-H data
    # (no NULL custkeys): plan and values unchanged.
    return (
        dig.join(exact, ["o_orderpriority"], "left")
        .select(
            F.col("o_orderpriority").alias("g"),
            F.size(s["hashes"]).cast("long").alias("retained"),
            s["theta"].alias("theta_hash"),
            (F.abs(theta.sketch_theta_estimate(s)
                   / F.coalesce(F.col("nd"), F.lit(0)) - 1.0)
             <= 3.0 / 16.0).alias("within_3se"),
            ((summ["lower_bound_std"] <= summ["estimate"])
             & (summ["estimate"] <= summ["upper_bound_std"])
             & (summ["retained_entries"] == F.size(s["hashes"]))
             & (summ["theta"] > 0) & (summ["theta"] <= 1.0)
             ).alias("summary_ok"),
        )
        .orderBy("g")
    )


_KLL_EXACT_ORACLE = """
WITH src AS (
  SELECT o_orderpriority AS g,
         CAST(o_custkey % 400 AS DOUBLE) AS v
  FROM orders WHERE o_orderkey % 37 = 0
),
s AS (
  SELECT g, list(v ORDER BY v) AS xs, count(*) AS n FROM src GROUP BY g
)
SELECT g,
       xs[greatest(1, CAST(ceil(0.25 * n) AS BIGINT))] AS q25,
       xs[greatest(1, CAST(ceil(0.50 * n) AS BIGINT))] AS q50,
       xs[greatest(1, CAST(ceil(0.75 * n) AS BIGINT))] AS q75,
       xs[least(n, CAST(floor(0.50 * n) AS BIGINT) + 1)] AS q50_excl,
       (SELECT count(*) FROM src x WHERE x.g = s.g AND x.v <= 200.0)
         / CAST(n AS DOUBLE) AS rank_200_incl,
       (SELECT count(*) FROM src x WHERE x.g = s.g AND x.v < 200.0)
         / CAST(n AS DOUBLE) AS rank_200_excl,
       true AS merge_ok
FROM s ORDER BY g
"""


@register(
    "sketch_kll_exact_ops",
    oracle=_KLL_EXACT_ORACLE,
    doc="sketch_kll_with_k / sketch_kll_quantile / sketch_kll_rank in "
        "the exact regime (group size <= k: the coreset IS the sorted "
        "sample, sketch.rst:38-75; operators/kll.py). DuckDB replays "
        "both inclusivity variants of quantile and rank as order "
        "statistics. merge_ok asserts the (priority, status) partial "
        "rollup reproduces the direct sketch's median exactly.",
    tags=("sketch", "agg", "kll"),
)
def sketch_kll_exact_ops(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import kll

    src = (
        spark.table("orders")
        .filter(F.col("o_orderkey") % 37 == 0)
        .select(
            F.col("o_orderpriority").alias("g"),
            F.col("o_orderstatus").alias("st"),
            (F.col("o_custkey") % 400).cast("double").alias("v"),
        )
    )
    direct = kll.sketch_kll_with_k(src, ["g"], "v", k=8192, n_shards=4)
    merged = kll.merge_kll(
        kll.sketch_kll_with_k(src, ["g", "st"], "v", k=8192,
                              n_shards=4).drop("st"),
        ["g"], k=8192)
    vs, ws = F.col("vs"), F.col("ws")
    merge_ok_df = (
        direct.select(
            "g", kll.sketch_kll_quantile(vs, ws, 0.5).alias("__d"))
        .join(
            merged.select(
                "g", kll.sketch_kll_quantile(vs, ws, 0.5).alias("__m")),
            "g")
        .agg(F.bool_and(F.col("__d") == F.col("__m")).alias("merge_ok"))
    )
    return (
        direct.select(
            "g",
            kll.sketch_kll_quantile(vs, ws, 0.25).alias("q25"),
            kll.sketch_kll_quantile(vs, ws, 0.50).alias("q50"),
            kll.sketch_kll_quantile(vs, ws, 0.75).alias("q75"),
            kll.sketch_kll_quantile(vs, ws, 0.50, inclusive=False)
            .alias("q50_excl"),
            kll.sketch_kll_rank(vs, ws, 200.0).alias("rank_200_incl"),
            kll.sketch_kll_rank(vs, ws, 200.0, inclusive=False)
            .alias("rank_200_excl"),
        )
        .crossJoin(F.broadcast(merge_ok_df))
        .orderBy("g")
    )


_TDIGEST_EXACT_ORACLE = """
WITH src AS (
  SELECT o_orderpriority AS g,
         CAST(o_custkey % 400 AS DOUBLE) AS v
  FROM orders WHERE o_orderkey % 97 = 0
),
r AS (
  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS i,
         count(*) OVER (PARTITION BY g) AS n
  FROM src
),
t AS (
  SELECT g, max(n) AS n,
         sum(v * greatest(0.0, least(CAST(i AS DOUBLE), 0.75 * n)
                          - greatest(CAST(i - 1 AS DOUBLE), 0.25 * n)))
           / sum(greatest(0.0, least(CAST(i AS DOUBLE), 0.75 * n)
                          - greatest(CAST(i - 1 AS DOUBLE), 0.25 * n)))
           AS tm
  FROM r GROUP BY g
),
s AS (
  SELECT g, list(v ORDER BY v) AS xs, count(*) AS n FROM src GROUP BY g
)
SELECT s.g AS g,
       xs[greatest(1, CAST(ceil(0.50 * s.n) AS BIGINT))] AS q50,
       xs[greatest(1, CAST(ceil(0.90 * s.n) AS BIGINT))] AS q90,
       xs[greatest(1, CAST(ceil(0.25 * s.n) AS BIGINT))] AS q25_arr,
       CASE WHEN 200.0 BETWEEN xs[1] AND xs[CAST(s.n AS BIGINT)] THEN
         (SELECT count(*) FROM src x WHERE x.g = s.g AND x.v <= 200.0)
           / CAST(s.n AS DOUBLE) END AS rank_200,
       format('{:.6f}', t.tm) AS trimmed_mid,
       true AS scale_ok
FROM s JOIN t ON t.g = s.g
ORDER BY g
"""


@register(
    "sketch_tdigest_exact_ops",
    oracle=_TDIGEST_EXACT_ORACLE,
    doc="tdigest_agg / value_at_quantile / values_at_quantiles / "
        "quantile_at_value / trimmed_mean / scale_tdigest in the exact "
        "regime (TDigestFunctions.java:55-152; operators/tdigest.py "
        "over the qsketch coreset). DuckDB replays the order "
        "statistics, the rank, and the weight-overlap trimmed mean "
        "exactly; scale_ok asserts quantiles are invariant under "
        "scale_tdigest(2.0).",
    tags=("sketch", "agg", "tdigest"),
)
def sketch_tdigest_exact_ops(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import tdigest

    src = (
        spark.table("orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            F.col("o_orderpriority").alias("g"),
            (F.col("o_custkey") % 400).cast("double").alias("v"),
        )
    )
    sk = tdigest.tdigest_agg(src, ["g"], "v", compression=2048, n_shards=4)
    vs, ws = F.col("vs"), F.col("ws")
    scaled_ws = tdigest.scale_tdigest(ws, 2.0)
    return sk.select(
        "g",
        tdigest.value_at_quantile(vs, ws, 0.50).alias("q50"),
        tdigest.value_at_quantile(vs, ws, 0.90).alias("q90"),
        tdigest.values_at_quantiles(
            vs, ws, F.array(F.lit(0.25)))[0].alias("q25_arr"),
        tdigest.quantile_at_value(vs, ws, 200.0).alias("rank_200"),
        F.format_string(
            "%.6f", tdigest.trimmed_mean(vs, ws, 0.25, 0.75)
        ).alias("trimmed_mid"),
        (
            (tdigest.value_at_quantile(vs, scaled_ws, 0.50)
             == tdigest.value_at_quantile(vs, ws, 0.50))
            & (tdigest.value_at_quantile(vs, scaled_ws, 0.90)
               == tdigest.value_at_quantile(vs, ws, 0.90))
        ).alias("scale_ok"),
    ).orderBy("g")


_SFM_EXACT_ORACLE = """
WITH v AS (
  SELECT DISTINCT o_orderpriority AS g, o_custkey % 400 AS val
  FROM orders
), h AS (
  SELECT g, CAST(concat('0x', substr(md5(CAST(val AS VARCHAR)), 1, 15))
                 AS BIGINT) AS h60
  FROM v
), loc AS (
  SELECT DISTINCT g,
    (h60 >> 54) * 8
      + least(CAST(floor(log2((h60 | 18014398509481984)
                              & -(h60 | 18014398509481984))) AS BIGINT),
              7) AS loc
  FROM h
), bits AS (
  SELECT g, array_to_string(list_sort(list(loc)), ',') AS bits_s,
         count(*) AS n_bits
  FROM loc GROUP BY g
)
SELECT b.g,
       CAST(b.n_bits AS BIGINT) AS n_bits,
       b.bits_s,
       true AS est_ok,
       true AS merge_or_ok,
       true AS priv_est_ok,
       format('{:.8f}', 1.0 / (exp(2.0) + 1.0)) AS p_eps2,
       format('{:.8f}',
              (2.0 / (exp(2.0) + 1.0)
               - 3.0 / ((exp(2.0) + 1.0) * (exp(2.0) + 1.0)))
              / (1.0 - 2.0 / ((exp(2.0) + 1.0) * (exp(2.0) + 1.0))))
         AS p_merged,
       CAST(0 AS BIGINT) AS empty_card,
       true AS empty_merge_ok
FROM bits b ORDER BY b.g
"""


@register(
    "sketch_sfm_exact_ops",
    oracle=_SFM_EXACT_ORACLE,
    doc="Noisy SFM sketch family (SfmSketch.java; "
        "NoisyApproximateSetSfmAggregation / "
        "NoisyApproximateDistinctCountSfmAggregation / "
        "SfmSketchMergeAggregation; noisy.rst:100-200). Exact regime "
        "(epsilon = inf, bits deterministic): DuckDB replays the whole "
        "ON-bit set from the 60-bit md5 hash (bucket = top 6 bits, "
        "level = capped trailing zeros — SfmSketch.addHash:119-126) "
        "per o_orderpriority over o_custkey%400 at buckets=64/"
        "precision=8. merge_or_ok pins the non-private merge (bitwise "
        "OR, mergeWith:361-364) of even/odd-orderkey halves against "
        "the directly-built sketch; est_ok/priv_est_ok envelope the "
        "Newton pseudolikelihood estimator (cardinality:144-157) at "
        "epsilon inf and 2; p_eps2/p_merged replay the randomized-"
        "response probability 1/(e^eps+1) (:228-236) and the Theorem "
        "4.8 merge formula (:330-333) exactly.",
    tags=("sketch", "agg", "noisy"),
)
def sketch_sfm_exact_ops(spark, sf_dir):
    prepare(spark, sf_dir)
    import math

    from presto_spark.operators import sfm

    orders = spark.table("orders").withColumn("__v", F.col("o_custkey") % 400)
    g = ["o_orderpriority"]
    non = sfm.noisy_approx_set_sfm(
        orders, g, "__v", epsilon=math.inf, buckets=64, precision=8)
    truth = (
        orders.select("o_orderpriority", "__v").distinct()
        .groupBy("o_orderpriority").agg(F.count("*").alias("__nd"))
    )
    h1 = sfm.noisy_approx_set_sfm(
        orders.filter(F.col("o_orderkey") % 2 == 0), g, "__v",
        math.inf, 64, 8)
    h2 = sfm.noisy_approx_set_sfm(
        orders.filter(F.col("o_orderkey") % 2 == 1), g, "__v",
        math.inf, 64, 8)
    merged = sfm.merge_sfm_nonprivate(h1.unionByName(h2), g).select(
        "o_orderpriority", F.col("sfm").alias("msfm"))
    priv = sfm.noisy_approx_set_sfm(
        orders, g, "__v", epsilon=2.0, buckets=64, precision=8, seed=11
    ).select("o_orderpriority", F.col("sfm").alias("psfm"))
    pa = sfm.noisy_approx_set_sfm(
        orders.filter(F.col("o_orderkey") % 2 == 0), g, "__v",
        2.0, 64, 8, seed=1).select("o_orderpriority",
                                   F.col("sfm").alias("a"))
    pb = sfm.noisy_approx_set_sfm(
        orders.filter(F.col("o_orderkey") % 2 == 1), g, "__v",
        2.0, 64, 8, seed=2).select("o_orderpriority",
                                   F.col("sfm").alias("b"))
    pmerged = pa.join(pb, "o_orderpriority").select(
        "o_orderpriority",
        sfm.sfm_merge_scalar(F.col("a"), F.col("b"), 64, 8, seed=9)
        .alias("pm"))
    nd = F.col("__nd").cast("double")
    return (
        non.join(truth, "o_orderpriority")
        .join(merged, "o_orderpriority")
        .join(priv, "o_orderpriority")
        .join(pmerged, "o_orderpriority")
        .select(
            F.col("o_orderpriority").alias("g"),
            F.size("sfm.on_bits").cast("bigint").alias("n_bits"),
            F.array_join(
                F.transform("sfm.on_bits", lambda b: b.cast("string")),
                ",").alias("bits_s"),
            (F.abs(sfm.sfm_cardinality(F.col("sfm")).cast("double") - nd)
             / nd <= 0.25).alias("est_ok"),
            (F.col("msfm.on_bits") == F.col("sfm.on_bits"))
            .alias("merge_or_ok"),
            (F.abs(sfm.sfm_cardinality(F.col("psfm")).cast("double") - nd)
             / nd <= 0.5).alias("priv_est_ok"),
            F.format_string("%.8f", F.col("psfm.p")).alias("p_eps2"),
            F.format_string("%.8f", F.col("pm.p")).alias("p_merged"),
            # noisy_empty_approx_set_sfm (noisy.rst:160-168): the
            # epsilon=inf empty sketch estimates 0 and is the identity
            # for the non-private merge — the documented coalesce()
            # partner for NULL-on-empty noisy aggregates.
            sfm.sfm_cardinality(
                sfm.noisy_empty_approx_set_sfm(math.inf, 64, 8)
            ).cast("bigint").alias("empty_card"),
            (sfm.sfm_merge_scalar(
                sfm.noisy_empty_approx_set_sfm(math.inf, 64, 8),
                F.col("sfm"), 64, 8, seed=3)["on_bits"]
             == F.col("sfm.on_bits")).alias("empty_merge_ok"),
        )
        .orderBy("g")
    )
