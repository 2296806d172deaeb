"""Scalar-function conformance, part 2: map/binary/URL/bitwise/interval.

Continues functions_suite.py's golden-corpus compression (reference
taxonomy: presto-docs/src/main/sphinx/functions/ — 35 categories).
Categories here complete the SURVEY §2.8 inventory rows that part 1
left uncovered: map functions, binary/crypto, URL, bitwise, and
date/time interval arithmetic.
"""

from presto_spark.queries.base import dual_sql_query, sql_query

# ---- maps (reference: operator/scalar/MapFilterFunction.java,
# MapTransformValueFunction.java:89, MapZipWithFunction.java,
# MapConcatFunction.java) ----
# Maps are unordered, so every output is serialized to sorted entry
# strings — the same canonicalization both engines can agree on.

dual_sql_query(
    "fn_map_suite",
    """
    WITH m AS (
      SELECT n_nationkey AS k,
             map('a', n_nationkey, 'b', n_regionkey,
                 'c', n_nationkey + n_regionkey) AS mp
      FROM nation
    )
    SELECT
      k,
      array_join(array_sort(transform(map_entries(mp),
                 e -> concat(e.key, '=', cast(e.value AS STRING)))), ',')
        AS entries_str,
      array_join(array_sort(map_keys(mp)), ',') AS keys_str,
      cast(element_at(mp, 'b') AS BIGINT) AS val_b,
      size(mp) AS n_entries,
      array_join(array_sort(transform(map_entries(
          map_filter(mp, (x, v) -> v > 2)),
          e -> e.key)), ',') AS big_keys,
      array_join(array_sort(transform(map_entries(
          transform_values(mp, (x, v) -> v * 10)),
          e -> concat(e.key, '=', cast(e.value AS STRING)))), ',')
        AS scaled_str
    FROM m
    ORDER BY k
    """,
    """
    WITH m AS (
      SELECT n_nationkey AS k,
             MAP {'a': n_nationkey, 'b': n_regionkey,
                  'c': n_nationkey + n_regionkey} AS mp
      FROM nation
    )
    SELECT
      k,
      array_to_string(list_sort(list_transform(map_entries(mp),
                      e -> concat(e.key, '=', e.value::VARCHAR))), ',')
        AS entries_str,
      array_to_string(list_sort(map_keys(mp)), ',') AS keys_str,
      CAST(element_at(mp, 'b')[1] AS BIGINT) AS val_b,
      cardinality(mp) AS n_entries,
      coalesce(array_to_string(list_sort(list_transform(
          map_entries(mp), e -> CASE WHEN e.value > 2 THEN e.key END)
          .list_filter(x -> x IS NOT NULL)), ','), '') AS big_keys,
      array_to_string(list_sort(list_transform(map_entries(mp),
                      e -> concat(e.key, '=', (e.value * 10)::VARCHAR))), ',')
        AS scaled_str
    FROM m
    ORDER BY k
    """,
    doc="Map function battery (map_from_entries/map_entries/map_keys/"
        "element_at/cardinality/map_filter/transform_values — "
        "MapFilterFunction.java, MapTransformValueFunction.java:89). "
        "Outputs canonicalized to sorted entry strings (maps are "
        "unordered).",
    tags=("functions", "map"),
)

# ---- binary / crypto (reference: operator/scalar/VarbinaryFunctions.java,
# HmacFunctions.java) ----

dual_sql_query(
    "fn_binary_suite",
    """
    SELECT
      n_nationkey,
      md5(n_name) AS h_md5,
      sha2(n_name, 256) AS h_sha256,
      base64(encode(n_name, 'UTF-8')) AS b64,
      decode(unbase64(base64(encode(n_name, 'UTF-8'))), 'UTF-8') AS b64_rt,
      upper(hex(encode(substr(n_name, 1, 4), 'UTF-8'))) AS hex4,
      length(encode(n_name, 'UTF-8')) AS n_bytes
    FROM nation
    ORDER BY n_nationkey
    """,
    """
    SELECT
      n_nationkey,
      md5(n_name) AS h_md5,
      sha256(n_name) AS h_sha256,
      to_base64(encode(n_name)) AS b64,
      decode(from_base64(to_base64(encode(n_name)))) AS b64_rt,
      upper(hex(encode(substr(n_name, 1, 4)))) AS hex4,
      octet_length(encode(n_name)) AS n_bytes
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="Binary/crypto battery (VarbinaryFunctions.java: md5, sha256, "
        "to/from_base64, to_hex, length). to_utf8 ≡ encode; "
        "round-trips asserted.",
    tags=("functions", "binary"),
)

# ---- URL (reference: operator/scalar/UrlFunctions.java:42) ----
# DuckDB has no URL parser: fixed literal inputs, literal expected rows.

sql_query(
    "fn_url_suite",
    """
    WITH u AS (
      SELECT stack(3,
        1, 'https://example.com:8080/docs/view?id=42&lang=en#frag',
        2, 'http://user@sub.host.org/a/b',
        3, 'ftp://files.net/pub'
      ) AS (i, url)
    )
    SELECT
      i,
      parse_url(url, 'HOST') AS host,
      parse_url(url, 'PATH') AS path,
      parse_url(url, 'QUERY') AS query,
      parse_url(url, 'PROTOCOL') AS protocol,
      parse_url(url, 'QUERY', 'id') AS param_id
    FROM u ORDER BY i
    """,
    oracle="""
    SELECT * FROM (VALUES
      (1, 'example.com', '/docs/view', 'id=42&lang=en', 'https', '42'),
      (2, 'sub.host.org', '/a/b', NULL, 'http', NULL),
      (3, 'files.net', '/pub', NULL, 'ftp', NULL)
    ) AS t(i, host, path, query, protocol, param_id)
    ORDER BY i
    """,
    doc="URL battery (UrlFunctions.java:42 url_extract_host/path/query/"
        "protocol/parameter → parse_url). DuckDB has no URL parser, so "
        "the oracle is the expected literal table (host excludes port).",
    tags=("functions", "url"),
)

# ---- bitwise (reference: operator/scalar/BitwiseFunctions.java) ----

dual_sql_query(
    "fn_bitwise_suite",
    """
    SELECT
      n_nationkey,
      n_nationkey & 12 AS b_and,
      n_nationkey | 3 AS b_or,
      cast(n_nationkey ^ 5 AS BIGINT) AS b_xor,
      cast(~n_nationkey AS BIGINT) AS b_not,
      shiftleft(n_nationkey, 2) AS shl,
      shiftright(n_nationkey, 1) AS shr,
      bit_count(n_nationkey) AS popcnt
    FROM nation
    ORDER BY n_nationkey
    """,
    """
    SELECT
      n_nationkey,
      n_nationkey & 12 AS b_and,
      n_nationkey | 3 AS b_or,
      CAST(xor(n_nationkey, 5) AS BIGINT) AS b_xor,
      CAST(~n_nationkey AS BIGINT) AS b_not,
      n_nationkey << 2 AS shl,
      n_nationkey >> 1 AS shr,
      bit_count(n_nationkey::BIT) AS popcnt
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="Bitwise battery (BitwiseFunctions.java: bitwise_and/or/xor/not, "
        "shifts, bit_count).",
    tags=("functions", "bitwise"),
)

# ---- date/time interval arithmetic (reference:
# operator/scalar/DateTimeFunctions.java:71 dateAdd/dateDiff/dateTrunc) ----

dual_sql_query(
    "fn_interval_suite",
    """
    SELECT
      o_orderkey,
      date_trunc('month', o_orderdate) AS month_start,
      date_trunc('quarter', o_orderdate) AS q_start,
      o_orderdate + INTERVAL '30' DAY AS plus30d,
      o_orderdate - INTERVAL '2' HOUR AS minus2h,
      cast(timestampdiff(DAY, timestamp'1995-01-01 00:00:00', o_orderdate)
           AS BIGINT) AS days_since_95,
      cast(timestampdiff(MONTH, timestamp'1995-01-01 00:00:00', o_orderdate)
           AS BIGINT) AS months_since_95,
      timestampadd(MONTH, 3, o_orderdate) AS plus3mo,
      year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      month(o_orderdate) AS mo, day(o_orderdate) AS dom,
      hour(o_orderdate) AS hr
    FROM orders WHERE o_orderkey <= 50
    ORDER BY o_orderkey
    """,
    """
    SELECT
      o_orderkey,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_start,
      o_orderdate + INTERVAL 30 DAY AS plus30d,
      o_orderdate - INTERVAL 2 HOUR AS minus2h,
      date_diff('day', timestamp'1995-01-01 00:00:00', o_orderdate)
        AS days_since_95,
      date_diff('month', timestamp'1995-01-01 00:00:00', o_orderdate)
        AS months_since_95,
      o_orderdate + INTERVAL 3 MONTH AS plus3mo,
      year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      month(o_orderdate) AS mo, day(o_orderdate) AS dom,
      hour(o_orderdate) AS hr
    FROM orders WHERE o_orderkey <= 50
    ORDER BY o_orderkey
    """,
    doc="Interval/date-part battery (DateTimeFunctions.java: date_trunc, "
        "date_add/date_diff — Presto's unit-string spellings map to "
        "timestampadd/timestampdiff via the dialect layer — interval "
        "literals, extract shorthands).",
    tags=("functions", "datetime"),
)

# ---- window extras: RANGE interval frames + IGNORE NULLS ----

dual_sql_query(
    "window_range_interval_frame",
    """
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
             AS sum_last_hour
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    """
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
             AS sum_last_hour
    FROM (SELECT event_id, user_id, value,
                 time_bucket(INTERVAL 1 MICROSECOND, CAST(ts AS TIMESTAMP)) AS ts
          FROM events) e
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="RANGE frame with a time interval bound over event time "
        "(FrameInfo.java:26 RANGE frames; WindowNode.java:323). Oracle "
        "truncates ns→µs to match the engine's timestamp precision.",
    tags=("window", "events"),
)

dual_sql_query(
    "window_ignore_nulls",
    """
    WITH t AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS v
      FROM orders WHERE o_orderkey <= 100
    )

    SELECT o_orderkey,
           lag(v) IGNORE NULLS OVER wo AS prev_nn,
           lead(v) IGNORE NULLS OVER wo AS next_nn,
           first_value(v) IGNORE NULLS OVER wf AS first_nn,
           last_value(v) IGNORE NULLS OVER wf AS last_nn
    FROM t
    WINDOW wo AS (ORDER BY o_orderkey),
           wf AS (ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
    """
    WITH t AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS v
      FROM orders WHERE o_orderkey <= 100
    )

    SELECT o_orderkey,
           lag(v IGNORE NULLS) OVER wo AS prev_nn,
           lead(v IGNORE NULLS) OVER wo AS next_nn,
           first_value(v IGNORE NULLS) OVER wf AS first_nn,
           last_value(v IGNORE NULLS) OVER wf AS last_nn
    FROM t
    WINDOW wo AS (ORDER BY o_orderkey),
           wf AS (ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
    doc="IGNORE NULLS navigation functions (LagFunction.java/"
        "LeadFunction.java/FirstValueFunction.java with ignoreNulls).",
    tags=("window",),
)

# ---- JSON casts (reference: operator/scalar/JsonToArrayCast.java,
# JsonToMapCast.java, JsonToRowCast.java — CAST(json AS ARRAY/MAP/ROW)) ----

dual_sql_query(
    "fn_json_casts",
    """
    WITH j AS (
      SELECT event_id, props FROM events WHERE event_id < 30
    )
    SELECT
      event_id,
      get_json_object(props, '$.k') AS k_text,
      CAST(get_json_object(props, '$.k') AS BIGINT) AS k_int,
      from_json(props, 'k INT, tag STRING').tag AS tag,
      from_json('[1,2,3]', 'array<int>')[1] AS arr_elem2,
      size(from_json('[1,2,3]', 'array<int>')) AS arr_len,
      map_keys(from_json('{"a": 1, "b": 2}', 'map<string,int>'))[0] AS first_key,
      json_extract_scalar('{"a":{"b":1}}', '$.a') AS nonscalar_obj,
      json_extract_scalar('{"a":[1,2]}', '$.a') AS nonscalar_arr,
      json_extract_scalar('{"a":{"b":1}}', '$.a.b') AS scalar_leaf
    FROM j
    ORDER BY event_id
    """,
    """
    WITH j AS (
      SELECT event_id, props FROM events WHERE event_id < 30
    )
    SELECT
      event_id,
      json_extract_string(props, '$.k') AS k_text,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      json_extract_string(props, '$.tag') AS tag,
      CAST(json_extract('[1,2,3]', '$[1]') AS INT) AS arr_elem2,
      len(CAST('[1,2,3]'::JSON AS INT[])) AS arr_len,
      'a' AS first_key,
      CAST(NULL AS VARCHAR) AS nonscalar_obj,
      CAST(NULL AS VARCHAR) AS nonscalar_arr,
      '1' AS scalar_leaf
    FROM j
    ORDER BY event_id
    """,
    doc="JSON→typed casts (JsonToArrayCast.java / JsonToMapCast.java / "
        "JsonToRowCast.java): from_json to struct/array/map plus scalar "
        "extraction; the reference casts JSON values to ARRAY/MAP/ROW "
        "the same way.",
    tags=("functions", "json"),
)

# ---- math (reference: operator/scalar/MathFunctions.java:80 — 1,933 LoC) ----

dual_sql_query(
    "fn_math_suite",
    """
    SELECT
      n_nationkey,
      abs(n_nationkey - 12) AS abs_v,
      CAST(sign(n_nationkey - 12) AS INT) AS sign_v,
      mod(n_nationkey, 7) AS mod_v,
      CAST(ceil(n_nationkey / 4.0) AS BIGINT) AS ceil_v,
      CAST(floor(n_nationkey / 4.0) AS BIGINT) AS floor_v,
      CAST(round(sqrt(n_nationkey), 6) AS DOUBLE) AS sqrt_v,
      CAST(round(exp(n_nationkey / 10.0), 6) AS DOUBLE) AS exp_v,
      CAST(round(ln(n_nationkey + 1), 6) AS DOUBLE) AS ln_v,
      CAST(round(log10(n_nationkey + 1), 6) AS DOUBLE) AS log10_v,
      CAST(round(power(n_nationkey, 2.5), 4) AS DOUBLE) AS pow_v,
      CAST(round(sin(n_nationkey), 6) AS DOUBLE) AS sin_v,
      CAST(round(cos(n_nationkey), 6) AS DOUBLE) AS cos_v,
      CAST(round(atan2(n_nationkey, 3), 6) AS DOUBLE) AS atan2_v,
      CAST(round(degrees(n_nationkey / 10.0), 6) AS DOUBLE) AS deg_v,
      CAST(round(radians(n_nationkey * 10), 6) AS DOUBLE) AS rad_v,
      greatest(n_nationkey, 10, 15) AS greatest_v,
      least(n_nationkey, 10, 15) AS least_v,
      CAST(round(pi(), 6) AS DOUBLE) AS pi_v
    FROM nation
    ORDER BY n_nationkey
    """,
    """
    SELECT
      n_nationkey,
      abs(n_nationkey - 12) AS abs_v,
      CAST(sign(n_nationkey - 12) AS INT) AS sign_v,
      mod(n_nationkey, 7) AS mod_v,
      CAST(ceil(n_nationkey / 4.0) AS BIGINT) AS ceil_v,
      CAST(floor(n_nationkey / 4.0) AS BIGINT) AS floor_v,
      CAST(round(sqrt(n_nationkey), 6) AS DOUBLE) AS sqrt_v,
      CAST(round(exp(n_nationkey / 10.0), 6) AS DOUBLE) AS exp_v,
      CAST(round(ln(n_nationkey + 1), 6) AS DOUBLE) AS ln_v,
      CAST(round(log10(n_nationkey + 1), 6) AS DOUBLE) AS log10_v,
      CAST(round(pow(n_nationkey, 2.5), 4) AS DOUBLE) AS pow_v,
      CAST(round(sin(n_nationkey), 6) AS DOUBLE) AS sin_v,
      CAST(round(cos(n_nationkey), 6) AS DOUBLE) AS cos_v,
      CAST(round(atan2(n_nationkey, 3), 6) AS DOUBLE) AS atan2_v,
      CAST(round(degrees(n_nationkey / 10.0), 6) AS DOUBLE) AS deg_v,
      CAST(round(radians(n_nationkey * 10), 6) AS DOUBLE) AS rad_v,
      greatest(n_nationkey, 10, 15) AS greatest_v,
      least(n_nationkey, 10, 15) AS least_v,
      CAST(round(pi(), 6) AS DOUBLE) AS pi_v
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="Math battery (MathFunctions.java:80: abs/sign/mod/ceil/floor/"
        "sqrt/exp/ln/log10/power/trig/degrees/radians/greatest/least/pi).",
    tags=("functions", "math"),
)

# ---- min_by/max_by + checksum (reference: minmaxby/ package,
# ChecksumAggregationFunction.java) ----

dual_sql_query(
    "agg_minmax_by_checksum",
    """
    WITH li AS (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             l_orderkey * 10 + l_linenumber AS uniq
      FROM lineitem
    )
    SELECT
      l_returnflag,
      min_by(l_orderkey, uniq) AS first_order,
      max_by(l_orderkey, uniq) AS last_order,
      min_by(l_linenumber, uniq) AS first_line,
      CAST(sum(cast(conv(substr(md5(cast(uniq AS STRING)), 1, 8), 16, 10)
               AS BIGINT)) AS BIGINT) AS row_checksum
    FROM li
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    """
    WITH li AS (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             l_orderkey * 10 + l_linenumber AS uniq
      FROM lineitem
    )
    SELECT
      l_returnflag,
      arg_min(l_orderkey, uniq) AS first_order,
      arg_max(l_orderkey, uniq) AS last_order,
      arg_min(l_linenumber, uniq) AS first_line,
      CAST(sum(CAST(concat('0x', substring(md5(uniq::VARCHAR), 1, 8))
               AS BIGINT)) AS BIGINT) AS row_checksum
    FROM li
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="min_by/max_by (minmaxby/ package; arg_min/arg_max in DuckDB) "
        "keyed on a unique ordering value for determinism, plus an "
        "order-insensitive row checksum as sum of 32-bit md5 prefixes — "
        "ChecksumAggregationFunction.java's xor-of-xxhash64 contract "
        "with cross-engine-computable primitives.",
    tags=("functions", "agg"),
)

# ---- word_stem (reference: operator/scalar/WordStemFunction.java) ----

dual_sql_query(
    "fn_word_stem",
    """
    WITH words AS (
      SELECT stack(12, 1, 'stories', 2, 'churches', 3, 'dogs', 4, 'glass',
                       5, 'ties', 6, 'shoes', 7, 'cats', 8, 'bus',
                       9, 'relational', 10, 'motoring', 11, 'happiness',
                       12, 'adjustable')
        AS (i, w)
    )
    SELECT i, w, word_stem(w) AS stem FROM words ORDER BY i
    """,
    """
    SELECT * FROM (VALUES
      (1, 'stories', 'stori'), (2, 'churches', 'church'),
      (3, 'dogs', 'dog'), (4, 'glass', 'glass'),
      (5, 'ties', 'ti'), (6, 'shoes', 'shoe'),
      (7, 'cats', 'cat'), (8, 'bus', 'bu'),
      (9, 'relational', 'relat'), (10, 'motoring', 'motor'),
      (11, 'happiness', 'happi'), (12, 'adjustable', 'adjust'))
      AS t(i, w, stem)
    ORDER BY i
    """,
    doc="word_stem (WordStemFunction.java → Lucene PorterStemmer): full "
        "Porter algorithm over functions/porter.py, Arrow-batched. "
        "Goldens are canonical outputs from Porter's 1980 paper "
        "vocabulary (incl. the famous ties→ti / bus→bu edge cases); "
        "tests/test_functions.py pins 80+ more.",
    tags=("functions",),
)

dual_sql_query(
    "fn_map_suite2",
    """
    WITH m AS (
      SELECT n_nationkey AS k,
             map('a', n_nationkey, 'b', n_regionkey) AS m1,
             map('b', 100, 'c', 200) AS m2
      FROM nation WHERE n_nationkey < 10
    )
    SELECT
      k,
      array_join(array_sort(transform(map_entries(
          map_concat(m1, m2)),
          e -> concat(e.key, '=', cast(e.value AS STRING)))), ',')
        AS concat_str,
      array_join(array_sort(transform(map_entries(
          transform_keys(m1, (x, v) -> upper(x))),
          e -> concat(e.key, '=', cast(e.value AS STRING)))), ',')
        AS upkeys_str,
      array_join(array_sort(transform(map_entries(
          map_zip_with(m1, m2, (x, v1, v2) ->
            coalesce(v1, 0) + coalesce(v2, 0))),
          e -> concat(e.key, '=', cast(e.value AS STRING)))), ',')
        AS zip_str,
      array_join(array_sort(transform(map_entries(
          map_from_arrays(array('p', 'q'), array(k, k + 1))),
          e -> concat(e.key, '=', cast(e.value AS STRING)))), ',')
        AS from_arrays_str
    FROM m
    ORDER BY k
    """,
    """
    WITH m AS (
      SELECT n_nationkey AS k,
             MAP {'a': n_nationkey, 'b': n_regionkey} AS m1,
             MAP {'b': 100, 'c': 200} AS m2
      FROM nation WHERE n_nationkey < 10
    ),
    keys AS (
      SELECT k, m1, m2,
             list_distinct(list_concat(map_keys(m1), map_keys(m2))) AS allk
      FROM m
    )
    SELECT
      k,
      array_to_string(list_sort(list_transform(allk,
          kk -> concat(kk, '=', coalesce(element_at(m2, kk)[1],
                                         element_at(m1, kk)[1])::VARCHAR))), ',')
        AS concat_str,
      array_to_string(list_sort(list_transform(map_entries(m1),
          e -> concat(upper(e.key), '=', e.value::VARCHAR))), ',')
        AS upkeys_str,
      array_to_string(list_sort(list_transform(allk,
          kk -> concat(kk, '=', (coalesce(element_at(m1, kk)[1], 0)
                                 + coalesce(element_at(m2, kk)[1], 0))::VARCHAR))), ',')
        AS zip_str,
      array_to_string(list_sort(['p=' || k::VARCHAR,
                                 'q=' || (k + 1)::VARCHAR]), ',')
        AS from_arrays_str
    FROM keys
    ORDER BY k
    """,
    doc="Map battery part 2: map_concat (last-wins like Presto), "
        "transform_keys, map_zip_with, map_from_arrays "
        "(MapConcatFunction.java, MapZipWithFunction.java). DuckDB "
        "lacks these HOFs — the oracle expands the definitions over the "
        "key union.",
    tags=("functions", "map"),
)

# ---- higher moments + linear regression (reference:
# CentralMomentsAggregation.java skewness/kurtosis,
# DoubleRegressionAggregation.java regr_slope/regr_intercept) ----

sql_query(
    "agg_moments_regression",
    """
    WITH s AS (
      SELECT
        count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxxx,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem
    )
    SELECT
      n,
      round((sxxx / n - 3 * (sx / n) * (sxx / n) + 2 * (sx / n) * (sx / n) * (sx / n))
            / power(sxx / n - (sx / n) * (sx / n), 1.5), 6) AS skewness_pop,
      round((sxy / n - (sx / n) * (sy / n))
            / (sxx / n - (sx / n) * (sx / n)), 6) AS regr_slope,
      round((sy / n) - ((sxy / n - (sx / n) * (sy / n))
            / (sxx / n - (sx / n) * (sx / n))) * (sx / n), 4) AS regr_intercept
    FROM s
    """,
    doc="Population skewness + regr_slope/regr_intercept "
        "(CentralMomentsAggregation.java, DoubleRegressionAggregation"
        ".java) computed from exact decimal power sums — the moment "
        "formulas both engines then evaluate identically in DOUBLE "
        "(one-pass builtin implementations drift between engines; "
        "power sums don't).",
    tags=("functions", "agg"),
)

# ---- decimal arithmetic + cast matrix (reference: DecimalType.java:25,
# UnscaledDecimal128Arithmetic.java — 128-bit path; sql/analyzer/
# coercions for the cast matrix) ----

sql_query(
    "fn_decimal_cast_suite",
    """
    WITH v AS (
      SELECT CAST(o_totalprice AS DECIMAL(14,2)) AS d,
             CAST(o_orderkey AS DECIMAL(10,0)) AS k,
             o_orderkey
      FROM orders WHERE o_orderkey <= 40
    )
    SELECT
      o_orderkey,
      CAST(CAST(d + CAST(0.05 AS DECIMAL(4,2)) AS DECIMAL(15,2)) AS STRING) AS add_scale,
      CAST(CAST(d * CAST(1.1 AS DECIMAL(3,1)) AS DECIMAL(18,3)) AS STRING) AS mul_scale,
      CAST(CAST(d / 7 AS DECIMAL(20,6)) AS STRING) AS div_scale,
      CAST(d AS BIGINT) AS to_bigint,  -- engine truncates (see doc)
      CAST(CAST(CAST(d AS DOUBLE) AS DECIMAL(14,2)) AS STRING) AS double_roundtrip,
      CAST(CAST(o_orderkey AS STRING) AS BIGINT) AS string_roundtrip,
      CAST(CAST('123.45' AS DECIMAL(10,2)) AS STRING) AS dec_to_str,
      CAST(CAST('2020-06-15' AS DATE) AS STRING) AS str_to_date,
      CAST(CAST(CAST('2020-06-15 12:30:00' AS TIMESTAMP) AS DATE) AS STRING) AS ts_to_date,
      year(CAST('2020-06-15' AS DATE)) AS date_year,
      CAST(true AS INT) AS bool_to_int,
      CAST(1 AS BOOLEAN) AS int_to_bool
    FROM v
    ORDER BY o_orderkey
    """,
    oracle="""
    WITH v AS (
      SELECT CAST(o_totalprice AS DECIMAL(14,2)) AS d,
             CAST(o_orderkey AS DECIMAL(10,0)) AS k,
             o_orderkey
      FROM orders WHERE o_orderkey <= 40
    )
    SELECT
      o_orderkey,
      CAST(CAST(d + CAST(0.05 AS DECIMAL(4,2)) AS DECIMAL(15,2)) AS VARCHAR) AS add_scale,
      CAST(CAST(d * CAST(1.1 AS DECIMAL(3,1)) AS DECIMAL(18,3)) AS VARCHAR) AS mul_scale,
      CAST(CAST(d / 7 AS DECIMAL(20,6)) AS VARCHAR) AS div_scale,
      CAST(trunc(d) AS BIGINT) AS to_bigint,
      CAST(CAST(CAST(d AS DOUBLE) AS DECIMAL(14,2)) AS VARCHAR) AS double_roundtrip,
      CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS string_roundtrip,
      CAST(CAST('123.45' AS DECIMAL(10,2)) AS VARCHAR) AS dec_to_str,
      CAST(CAST('2020-06-15' AS DATE) AS VARCHAR) AS str_to_date,
      CAST(CAST(CAST('2020-06-15 12:30:00' AS TIMESTAMP) AS DATE) AS VARCHAR) AS ts_to_date,
      year(CAST('2020-06-15' AS DATE)) AS date_year,
      CAST(true AS INT) AS bool_to_int,
      CAST(1 AS BOOLEAN) AS int_to_bool
    FROM v
    ORDER BY o_orderkey
    """,
    doc="Decimal arithmetic scale rules (add/multiply/divide widen per "
        "DecimalType.java) with explicit result types, plus the cast "
        "matrix rows: decimal<->bigint/double/string, string<->date, "
        "timestamp->date, bool<->int (sql/analyzer coercions). "
        "DEVIATION pinned: decimal->bigint truncates toward zero in the "
        "engine (Spark/ANSI-off) where Presto and DuckDB round "
        "half-up; the oracle truncates explicitly. div_scale is emitted "
        "as the DECIMAL(20,6) string so no engine/driver decimal-"
        "rendering choice can perturb the value hash (r4 driver hash "
        "flake hardening); r6 extends the same string emission to "
        "add_scale/mul_scale/double_roundtrip (DuckDB->pandas gives "
        "float64 where Spark gives decimal.Decimal objects) and "
        "str_to_date/ts_to_date (datetime.date vs pandas Timestamp) "
        "— the r5 driver hash-flake root cause.",
    tags=("functions", "types"),
)

# ---- TIME type shims (reference: presto-common/.../type/TimeType.java;
# DateTimeFunctions.java hour/minute/secondFromTime).  Spark has no TIME
# type (SURVEY §1.2): the engine models TIME as BIGINT millis-of-day and
# ships constructor/extractor/format shims in functions/registry.py.
# The oracle spells the same arithmetic over epoch_ms.

dual_sql_query(
    "fn_time_type",
    """
    WITH e AS (
      SELECT event_id, time_from_timestamp(ts) AS tms
      FROM events WHERE event_id <= 40
    )
    SELECT
      event_id,
      tms,
      hour_of_time(tms) AS h,
      minute_of_time(tms) AS m,
      second_of_time(tms) AS s,
      format_time(tms) AS hms,
      time_of(hour_of_time(tms), minute_of_time(tms), second_of_time(tms))
        AS whole_sec_ms
    FROM e
    ORDER BY event_id
    """,
    """
    WITH e AS (
      SELECT event_id, epoch_ms(ts) % 86400000 AS tms
      FROM events WHERE event_id <= 40
    )
    SELECT
      event_id,
      tms,
      CAST(tms // 3600000 AS INTEGER) AS h,
      CAST((tms // 60000) % 60 AS INTEGER) AS m,
      CAST((tms // 1000) % 60 AS INTEGER) AS s,
      concat(lpad(CAST(tms // 3600000 AS VARCHAR), 2, '0'), ':',
             lpad(CAST((tms // 60000) % 60 AS VARCHAR), 2, '0'), ':',
             lpad(CAST((tms // 1000) % 60 AS VARCHAR), 2, '0')) AS hms,
      CAST((tms // 3600000) * 3600000
           + ((tms // 60000) % 60) * 60000
           + ((tms // 1000) % 60) * 1000 AS BIGINT) AS whole_sec_ms
    FROM e
    ORDER BY event_id
    """,
    doc="TIME-as-millis-of-day model (TimeType.java has no Spark "
        "equivalent): time_from_timestamp / time_of constructors, "
        "hour/minute/second_of_time extractors, format_time HH:mm:ss — "
        "all registered as SQL UDFs so they inline into codegen.",
    tags=("functions", "types"),
)

# ---- datetime misc shims (reference: operator/scalar/DateTimeFunctions.java
# toISO8601 / fromISO8601Date / parseDuration / atTimeZone).  Durations are
# oracle-checked against hand-computed expected millis; at_timezone against
# DuckDB's ICU timezone() composition on the same instants.

dual_sql_query(
    "fn_datetime_misc",
    """
    WITH v AS (
      SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP_NTZ) AS ts
      FROM orders WHERE o_orderkey <= 30
    )
    SELECT
      o_orderkey,
      to_iso8601(ts) AS iso,
      from_iso8601_date('2024-03-01') AS d,
      parse_duration('3.5m') AS dur_m,
      parse_duration('250ms') AS dur_ms,
      parse_duration('1.5h') AS dur_h,
      parse_duration('2d') AS dur_d,
      at_timezone(TIMESTAMP_NTZ '2024-01-01 12:00:00', 'Asia/Tokyo') AS tokyo,
      at_timezone(ts, 'America/New_York') AS ny
    FROM v
    ORDER BY o_orderkey
    """,
    """
    WITH v AS (
      SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts
      FROM orders WHERE o_orderkey <= 30
    )
    SELECT
      o_orderkey,
      strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') AS iso,
      CAST('2024-03-01' AS DATE) AS d,
      CAST(210000 AS DOUBLE) AS dur_m,
      CAST(250 AS DOUBLE) AS dur_ms,
      CAST(5400000 AS DOUBLE) AS dur_h,
      CAST(172800000 AS DOUBLE) AS dur_d,
      timezone('Asia/Tokyo', timezone('UTC', TIMESTAMP '2024-01-01 12:00:00'))
        AS tokyo,
      timezone('America/New_York', timezone('UTC', ts)) AS ny
    FROM v
    ORDER BY o_orderkey
    """,
    doc="to_iso8601 / from_iso8601_date / parse_duration (millis model) / "
        "at_timezone (zone-less-UTC engine TIMESTAMP -> wall clock in "
        "zone) — DateTimeFunctions.java misc rows; durations pinned to "
        "hand-computed millis, zone conversion cross-checked against "
        "DuckDB ICU.",
    tags=("functions",),
)

# ---- probability / statistics (reference: WilsonInterval.java,
# MathFunctions.java cauchyCdf) — closed forms duplicated in both engines.

dual_sql_query(
    "fn_prob_suite",
    """
    WITH s AS (
      SELECT l_returnflag,
             count_if(l_discount > 0.05) AS x,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT
      l_returnflag,
      round(wilson_interval_lower(x, n, 1.96), 8) AS w_lo,
      round(wilson_interval_upper(x, n, 1.96), 8) AS w_hi,
      round(cauchy_cdf(0.0D, 1.0D, 1.0D), 8) AS cauchy_1,
      round(cauchy_cdf(2.0D, 3.0D, 2.0D), 8) AS cauchy_center,
      array_join(transform(map_keys(split_to_map('a=1,b=2', ',', '=')),
                           k -> k), ',') AS stm_keys
    FROM s
    ORDER BY l_returnflag
    """,
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS x,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT
      l_returnflag,
      round(((x / CAST(n AS DOUBLE)) + 1.96 * 1.96 / (2 * n)
             - 1.96 * sqrt(((x / CAST(n AS DOUBLE)) * (1 - x / CAST(n AS DOUBLE))
                            + 1.96 * 1.96 / (4 * n)) / n))
            / (1 + 1.96 * 1.96 / n), 8) AS w_lo,
      round(((x / CAST(n AS DOUBLE)) + 1.96 * 1.96 / (2 * n)
             + 1.96 * sqrt(((x / CAST(n AS DOUBLE)) * (1 - x / CAST(n AS DOUBLE))
                            + 1.96 * 1.96 / (4 * n)) / n))
            / (1 + 1.96 * 1.96 / n), 8) AS w_hi,
      round(0.5 + atan((1.0 - 0.0) / 1.0) / pi(), 8) AS cauchy_1,
      round(0.5 + atan((2.0 - 2.0) / 3.0) / pi(), 8) AS cauchy_center,
      array_to_string(list_sort(map_keys(MAP {'a': '1', 'b': '2'})), ',')
        AS stm_keys
    FROM s
    ORDER BY l_returnflag
    """,
    doc="wilson_interval_lower/upper (WilsonInterval.java) and cauchy_cdf "
        "(MathFunctions.java) — identical closed-form arithmetic spelled "
        "in both engines, round(8) to absorb libm ulp differences; plus "
        "split_to_map (SplitToMapFunction.java -> str_to_map) key set.",
    tags=("functions",),
)

sql_query(
    "fn_normal_cdf_envelope",
    """
    SELECT
      abs(normal_cdf(0.0D, 1.0D, 1.959964D) - 0.975) < 1e-6 AS ncdf_ok,
      normal_cdf(2.0D, 3.0D, 2.0D) = 0.5 AS center_ok,
      abs(inverse_normal_cdf(0.0D, 1.0D, 0.975D) - 1.959964) < 1e-4 AS inv_ok,
      abs(inverse_normal_cdf(0.0D, 1.0D, 0.001D) + 3.0902323) < 1e-4 AS tail_ok,
      abs(normal_cdf(0.0D, 1.0D, inverse_normal_cdf(0.0D, 1.0D, 0.3D)) - 0.3)
        < 1e-5 AS roundtrip_ok,
      abs(normal_cdf(10.0D, 2.0D, 11.0D)
          + normal_cdf(10.0D, 2.0D, 9.0D) - 1.0) < 1e-7 AS symmetry_ok
    """,
    oracle="""
    SELECT true AS ncdf_ok, true AS center_ok, true AS inv_ok,
           true AS tail_ok, true AS roundtrip_ok, true AS symmetry_ok
    """,
    doc="normal_cdf (A-S 7.1.26 erf, |err|<1.5e-7) and inverse_normal_cdf "
        "(Acklam rational approximation) — approximation-envelope checks "
        "against known quantiles, center, tails, round-trip, and symmetry "
        "(MathFunctions.java normalCdf/inverseNormalCdf; value-level "
        "parity is approximation-specific, the envelope is the contract).",
    tags=("functions",),
)

# ---- set_agg / map_union / entropy aggregates (reference:
# SetAggregationFunction.java, MapUnionAggregation.java,
# EntropyAggregation.java; builders in operators/aggregates.py) ----

dual_sql_query(
    "agg_set_map_union",
    """
    WITH nm AS (
      SELECT r_name, n_name, n_nationkey, map(n_name, n_nationkey) AS mp
      FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT
      r_name,
      array_join(array_sort(collect_set(substring(n_name, 1, 1))), ',')
        AS initials,
      array_join(array_sort(transform(map_entries(
          map_from_entries(flatten(collect_list(map_entries(mp))))),
          e -> concat(e.key, '=', CAST(e.value AS STRING)))), ',')
        AS unioned
    FROM nm
    GROUP BY r_name
    ORDER BY r_name
    """,
    """
    WITH nm AS (
      SELECT r_name, n_name, n_nationkey, MAP {n_name: n_nationkey} AS mp
      FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT
      r_name,
      array_to_string(list_sort(list_distinct(list(substring(n_name, 1, 1)))), ',')
        AS initials,
      array_to_string(list_sort(list_transform(map_entries(
          map_from_entries(flatten(list(map_entries(mp))))),
          e -> concat(e.key, '=', CAST(e.value AS VARCHAR)))), ',')
        AS unioned
    FROM nm
    GROUP BY r_name
    ORDER BY r_name
    """,
    doc="set_agg (collect_set, sorted render) and map_union (entry-level "
        "flatten — one shuffle, no per-key join) over nation maps keyed "
        "uniquely so the union is deterministic.",
    tags=("functions", "agg"),
)

dual_sql_query(
    "agg_entropy",
    """
    WITH c AS (
      SELECT l_returnflag, l_linestatus, count(*) AS c
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy_bits
    FROM c GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    """
    WITH c AS (
      SELECT l_returnflag, l_linestatus, count(*) AS c
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy_bits
    FROM c GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="entropy(c) (EntropyAggregation.java) — Shannon entropy in bits "
        "as the power-sum composition log2(S) - sum(c*log2(c))/S; "
        "partial-aggregation friendly, no collected state.",
    tags=("functions", "agg"),
)

# ---- IPADDRESS / IPPREFIX functions (reference: IpPrefixFunctions.java;
# types IpAddressType.java/IpPrefixType.java modeled as canonical strings,
# IPv4 scope).  Oracle recomputes the same pow-of-2 integer arithmetic.

dual_sql_query(
    "fn_ip_suite",
    """
    WITH c AS (
      SELECT c_custkey AS k,
             concat('10.', CAST(c_custkey % 256 AS STRING), '.',
                    CAST((c_custkey * 7) % 256 AS STRING), '.',
                    CAST((c_custkey * 13) % 256 AS STRING)) AS ip
      FROM customer WHERE c_custkey <= 40
    )
    SELECT
      k, ip,
      ip_prefix(ip, 24) AS pfx24,
      ip_prefix(ip, 12) AS pfx12,
      ip_subnet_min(ip_prefix(ip, 24)) AS smin,
      ip_subnet_max(ip_prefix(ip, 24)) AS smax,
      is_subnet_of('10.0.0.0/8', ip) AS in10_8,
      is_subnet_of('192.168.0.0/16', ip) AS in_private16
    FROM c
    ORDER BY k
    """,
    """
    WITH c AS (
      SELECT c_custkey AS k,
             concat('10.', CAST(c_custkey % 256 AS VARCHAR), '.',
                    CAST((c_custkey * 7) % 256 AS VARCHAR), '.',
                    CAST((c_custkey * 13) % 256 AS VARCHAR)) AS ip
      FROM customer WHERE c_custkey <= 40
    ),
    l AS (
      SELECT k, ip,
             ((CAST(string_split(ip, '.')[1] AS BIGINT) * 256
               + CAST(string_split(ip, '.')[2] AS BIGINT)) * 256
               + CAST(string_split(ip, '.')[3] AS BIGINT)) * 256
               + CAST(string_split(ip, '.')[4] AS BIGINT) AS lv
      FROM c
    ),
    n AS (
      SELECT k, ip, lv,
             (lv // 256) * 256 AS net24,
             (lv // 1048576) * 1048576 AS net12
      FROM l
    )
    SELECT
      k, ip,
      concat(CAST((net24 // 16777216) % 256 AS VARCHAR), '.',
             CAST((net24 // 65536) % 256 AS VARCHAR), '.',
             CAST((net24 // 256) % 256 AS VARCHAR), '.',
             CAST(net24 % 256 AS VARCHAR), '/24') AS pfx24,
      concat(CAST((net12 // 16777216) % 256 AS VARCHAR), '.',
             CAST((net12 // 65536) % 256 AS VARCHAR), '.',
             CAST((net12 // 256) % 256 AS VARCHAR), '.',
             CAST(net12 % 256 AS VARCHAR), '/12') AS pfx12,
      concat(CAST((net24 // 16777216) % 256 AS VARCHAR), '.',
             CAST((net24 // 65536) % 256 AS VARCHAR), '.',
             CAST((net24 // 256) % 256 AS VARCHAR), '.',
             CAST(net24 % 256 AS VARCHAR)) AS smin,
      concat(CAST(((net24 + 255) // 16777216) % 256 AS VARCHAR), '.',
             CAST(((net24 + 255) // 65536) % 256 AS VARCHAR), '.',
             CAST(((net24 + 255) // 256) % 256 AS VARCHAR), '.',
             CAST((net24 + 255) % 256 AS VARCHAR)) AS smax,
      lv BETWEEN 167772160 AND 184549375 AS in10_8,
      lv BETWEEN 3232235520 AND 3232301055 AS in_private16
    FROM n
    ORDER BY k
    """,
    doc="ip_prefix / ip_subnet_min / ip_subnet_max / is_subnet_of "
        "(IpPrefixFunctions.java) over the canonical-string IPv4 model — "
        "network masking as pow-of-2 integer arithmetic, oracle "
        "recomputes numerically (192.168.0.0/16 bounds are the literal "
        "uint32 range).",
    tags=("functions",),
)

# ---- closed-form distribution CDFs (reference: MathFunctions.java
# weibullCdf/laplaceCdf/logisticCdf and inverses) — identical closed
# forms spelled in both engines; round-trips pin the inverse pairs.

dual_sql_query(
    "fn_cdf_suite",
    """
    WITH v AS (
      SELECT l_orderkey AS k, CAST(l_quantity AS DOUBLE) / 10 AS x,
             (CAST(l_linenumber AS DOUBLE) + 0.5) / 8 AS p
      FROM lineitem WHERE l_orderkey <= 100 AND l_linenumber <= 7
    )
    SELECT
      k, round(x, 6) AS x, round(p, 6) AS p,
      round(weibull_cdf(1.5D, 2.0D, x), 8) AS wcdf,
      round(laplace_cdf(2.0D, 1.5D, x), 8) AS lacdf,
      round(logistic_cdf(2.0D, 1.5D, x), 8) AS locdf,
      round(inverse_weibull_cdf(1.5D, 2.0D, weibull_cdf(1.5D, 2.0D, x)), 8)
        AS w_roundtrip,
      round(inverse_laplace_cdf(2.0D, 1.5D, p), 8) AS inv_la,
      round(inverse_logistic_cdf(2.0D, 1.5D, p), 8) AS inv_lo
    FROM v
    ORDER BY k, x, p
    """,
    """
    WITH v AS (
      SELECT l_orderkey AS k, CAST(l_quantity AS DOUBLE) / 10 AS x,
             (CAST(l_linenumber AS DOUBLE) + 0.5) / 8 AS p
      FROM lineitem WHERE l_orderkey <= 100 AND l_linenumber <= 7
    )
    SELECT
      k, round(x, 6) AS x, round(p, 6) AS p,
      round(CASE WHEN x <= 0 THEN 0.0 ELSE 1 - exp(-pow(x / 2.0, 1.5)) END, 8)
        AS wcdf,
      round(CASE WHEN x < 2.0 THEN 0.5 * exp((x - 2.0) / 1.5)
                 ELSE 1 - 0.5 * exp(-(x - 2.0) / 1.5) END, 8) AS lacdf,
      round(1 / (1 + exp(-(x - 2.0) / 1.5)), 8) AS locdf,
      round(2.0 * pow(-ln(1 - (CASE WHEN x <= 0 THEN 0.0
                                    ELSE 1 - exp(-pow(x / 2.0, 1.5)) END)),
                      1 / 1.5), 8) AS w_roundtrip,
      round(CASE WHEN p < 0.5 THEN 2.0 + 1.5 * ln(2 * p)
                 ELSE 2.0 - 1.5 * ln(2 * (1 - p)) END, 8) AS inv_la,
      round(2.0 + 1.5 * ln(p / (1 - p)), 8) AS inv_lo
    FROM v
    ORDER BY k, x, p
    """,
    doc="weibull/laplace/logistic CDFs and closed-form inverses "
        "(MathFunctions.java) — same arithmetic both engines, round(8) "
        "absorbs libm ulp differences; weibull round-trip pins the "
        "inverse pair. Incomplete-integral CDFs (beta/gamma/chi2/F/"
        "binomial/poisson) documented out of scope.",
    tags=("functions",),
)

# ---- array set operations (reference: operator/scalar/
# ArrayUnionFunction.java, ArrayIntersectFunction.java,
# ArrayExceptFunction.java, ArraysOverlapFunction.java,
# ArrayRemoveFunction.java, RepeatFunction.java) — distinct-element
# semantics match Presto; sorted renders for cross-engine hashing.

dual_sql_query(
    "fn_array_setops_suite",
    """
    WITH v AS (
      SELECT n_nationkey AS k,
             array(n_nationkey, n_nationkey + 1, n_regionkey) AS a,
             array(n_regionkey, n_regionkey + 1) AS b
      FROM nation WHERE n_nationkey < 10
    )
    SELECT
      k,
      array_join(array_sort(array_union(a, b)), ',') AS u,
      array_join(array_sort(array_intersect(a, b)), ',') AS i,
      array_join(array_sort(array_except(a, b)), ',') AS e,
      arrays_overlap(a, b) AS ov,
      array_join(array_remove(array(1, 2, 3, 2), 2), ',') AS removed,
      array_join(array_repeat('x', 3), ',') AS repeated,
      array_join(reverse(sequence(1, 4)), ',') AS rev
    FROM v
    ORDER BY k
    """,
    """
    WITH v AS (
      SELECT n_nationkey AS k,
             [n_nationkey, n_nationkey + 1, n_regionkey] AS a,
             [n_regionkey, n_regionkey + 1] AS b
      FROM nation WHERE n_nationkey < 10
    )
    SELECT
      k,
      coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))),
                               ','), '') AS u,
      coalesce(array_to_string(list_sort(list_distinct(
          list_filter(a, x -> list_contains(b, x)))), ','), '') AS i,
      coalesce(array_to_string(list_sort(list_distinct(
          list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS e,
      list_has_any(a, b) AS ov,
      array_to_string(list_filter([1, 2, 3, 2], x -> x != 2), ',') AS removed,
      array_to_string(list_transform(range(1, 4), i -> 'x'), ',') AS repeated,
      array_to_string(list_reverse_sort(range(1, 5)), ',') AS rev
    FROM v
    ORDER BY k
    """,
    doc="array_union/intersect/except (distinct-element semantics), "
        "arrays_overlap, array_remove, repeat, reverse — the array "
        "set-operation rows of SURVEY §2.8; DuckDB spells them as "
        "list_filter/list_distinct compositions.",
    tags=("functions",),
)

# ---- sequence over temporal types + comparator array_sort (reference:
# SequenceFunction.java date/timestamp variants; ArraySortComparatorFunction
# .java).  Golden oracle: expected values hand-computed (single row).

sql_query(
    "fn_sequence_temporal",
    """
    SELECT
      array_join(transform(
          sequence(DATE '2024-01-01', DATE '2024-01-22', interval 1 week),
          d -> CAST(d AS STRING)), ',') AS weekly,
      array_join(sequence(5, 1, -2), ',') AS countdown,
      array_join(array_sort(array(-3, 1, -2),
          (l, r) -> CASE WHEN abs(l) < abs(r) THEN -1
                         WHEN abs(l) > abs(r) THEN 1 ELSE 0 END), ',')
        AS by_abs,
      array_join(transform(
          sequence(TIMESTAMP_NTZ '2024-01-01 00:00:00',
                   TIMESTAMP_NTZ '2024-01-01 06:00:00', interval 2 hour),
          t -> date_format(t, 'HH:mm')), ',') AS hours
    """,
    oracle="""
    SELECT
      '2024-01-01,2024-01-08,2024-01-15,2024-01-22' AS weekly,
      '5,3,1' AS countdown,
      '1,-2,-3' AS by_abs,
      '00:00,02:00,04:00,06:00' AS hours
    """,
    doc="sequence(date/timestamp, stop, interval step) and descending "
        "integer step (SequenceFunction.java variants), array_sort with "
        "a comparator lambda (ArraySortComparatorFunction.java) — "
        "hand-computed golden values as the oracle.",
    tags=("functions",),
)

# ---- SQL-invoked function plugin battery (reference: presto-sql-helpers/
# presto-sql-invoked-functions-plugin — ArraySqlFunctions.java,
# MapSqlFunctions.java, MapNormalizeFunction.java, StringSqlFunctions.java;
# shims in functions/registry.py).

dual_sql_query(
    "fn_array_sql_ordering",
    """
    WITH t AS (
      SELECT n_nationkey AS k,
             array(CAST(n_nationkey AS BIGINT),
                   CAST(24 - n_nationkey AS BIGINT),
                   CAST(NULL AS BIGINT),
                   CAST(n_regionkey * 7 AS BIGINT)) AS a
      FROM nation
    )
    SELECT k,
           array_join(remove_nulls(a), ',') AS no_nulls,
           array_join(transform(array_sort_desc(a),
               x -> coalesce(CAST(x AS STRING), 'N')), ',') AS sorted_desc,
           array_join(transform(array_top_n(a, 3),
               x -> coalesce(CAST(x AS STRING), 'N')), ',') AS top3
    FROM t ORDER BY k
    """,
    """
    WITH t AS (
      SELECT n_nationkey AS k,
             [CAST(n_nationkey AS BIGINT), CAST(24 - n_nationkey AS BIGINT),
              NULL, CAST(n_regionkey * 7 AS BIGINT)] AS a
      FROM nation
    )
    SELECT k,
           array_to_string(list_filter(a, x -> x IS NOT NULL), ',') AS no_nulls,
           array_to_string(list_transform(list_sort(a, 'DESC', 'NULLS LAST'),
               x -> coalesce(CAST(x AS VARCHAR), 'N')), ',') AS sorted_desc,
           array_to_string(list_transform(list_sort(a, 'DESC', 'NULLS LAST')[1:3],
               x -> coalesce(CAST(x AS VARCHAR), 'N')), ',') AS top3
    FROM t ORDER BY k
    """,
    doc="remove_nulls / array_sort_desc / array_top_n shims "
        "(ArraySqlFunctions.java) vs DuckDB's independent "
        "list_filter/list_sort('DESC','NULLS LAST') — data-driven over "
        "nation-derived arrays containing a NULL.",
    tags=("functions",),
)

sql_query(
    "fn_array_sql_golden",
    """
    SELECT
      array_join(transform(array_sort(map_entries(
          array_frequency(array('a', 'b', 'a', NULL, 'a')))),
          e -> concat(e.key, ':', CAST(e.value AS STRING))), ',') AS freq,
      array_join(array_least_frequent(array('b', 'a', 'c', 'b', 'c', 'b'), 2),
                 ',') AS least2,
      array_join(transform(array_split_into_chunks(array(1L, 2L, 3L, 4L, 5L), 2),
          c -> array_join(c, '-')), ',') AS chunks,
      array_join(transform(array_transpose(array(array(1L, 2L, 3L),
                                                 array(4L, 5L, 6L))),
          r -> array_join(r, '-')), ',') AS transposed
    """,
    oracle="""
    SELECT 'a:3,b:1' AS freq,
           'a,c' AS least2,
           '1-2,3-4,5' AS chunks,
           '1-4,2-5,3-6' AS transposed
    """,
    doc="array_frequency (nulls ignored), array_least_frequent (count asc "
        "then element asc), array_split_into_chunks (ragged tail), "
        "array_transpose — hand-computed goldens "
        "(ArraySqlFunctions.java bodies).",
    tags=("functions",),
)

sql_query(
    "fn_map_sql_golden",
    """
    WITH t AS (
      SELECT map('x', 5L, 'y', 9L, 'z', CAST(NULL AS BIGINT), 'w', 9L) AS m
    )
    SELECT
      array_join(transform(map_entries(map_top_n(m, 2)),
          e -> concat(e.key, ':', CAST(e.value AS STRING))), ',') AS top2,
      array_join(map_keys_by_top_n_values(m, 3), ',') AS keys_by_top3,
      array_join(map_top_n_keys(m, 2), ',') AS top2_keys,
      array_join(map_top_n_values(m, 2), ',') AS top2_vals,
      map_key_exists(m, 'z') AS has_z,
      array_join(transform(array_sort(map_entries(map_remove_null_values(m))),
          e -> concat(e.key, ':', CAST(e.value AS STRING))), ',') AS no_null_vals,
      array_join(transform(array_sort(map_entries(
          map_normalize(map('a', 1.0D, 'b', 3.0D)))),
          e -> concat(e.key, ':', CAST(CAST(e.value * 100 AS INT) AS STRING))),
          ',') AS normalized_pct,
      array_join(transform(map_int_keys_to_array(map(1, 'p', 3, 'q')),
          x -> coalesce(x, 'N')), ',') AS int_keys_arr,
      array_join(transform(array_sort(map_entries(
          array_to_map_int_keys(array('u', NULL, 'v')))),
          e -> concat(CAST(e.key AS STRING), ':', e.value)), ',') AS arr_to_map
    FROM t
    """,
    oracle="""
    SELECT 'y:9,w:9' AS top2,
           'y,w,x' AS keys_by_top3,
           'z,y' AS top2_keys,
           '9,9' AS top2_vals,
           true AS has_z,
           'w:9,x:5,y:9' AS no_null_vals,
           'a:25,b:75' AS normalized_pct,
           'p,N,q' AS int_keys_arr,
           '1:u,3:v' AS arr_to_map
    """,
    doc="map_top_n family (value desc, key desc ties, null values last), "
        "map_key_exists, map_remove_null_values, map_normalize, "
        "map_int_keys_to_array / array_to_map_int_keys — hand-computed "
        "goldens (MapSqlFunctions.java, MapNormalizeFunction.java).",
    tags=("functions",),
)

dual_sql_query(
    "fn_string_sql_suite2",
    """
    SELECT n_nationkey AS k,
           replace_first(n_name, 'A', '*') AS rf,
           trail(n_name, 4) AS t4,
           split_part_reverse(concat(n_name, '|', CAST(n_nationkey AS STRING)),
                              '|', -1) AS last_part,
           split_part_reverse(concat(n_name, '|', CAST(n_nationkey AS STRING)),
                              '|', 1) AS first_part
    FROM nation ORDER BY k
    """,
    """
    SELECT n_nationkey AS k,
           regexp_replace(n_name, 'A', '*') AS rf,
           right(n_name, 4) AS t4,
           string_split(n_name || '|' || CAST(n_nationkey AS VARCHAR), '|')[-1]
             AS last_part,
           string_split(n_name || '|' || CAST(n_nationkey AS VARCHAR), '|')[1]
             AS first_part
    FROM nation ORDER BY k
    """,
    doc="replace_first / trail / split_part_reverse shims "
        "(StringSqlFunctions.java) vs DuckDB's independent spellings "
        "(non-global regexp_replace, right(), negative list index).",
    tags=("functions",),
)


# ---- TIMESTAMP WITH TIME ZONE (reference: presto-common/.../type/
# TimestampWithTimeZoneType.java, DateTimeEncoding.java packed encoding;
# DateTimeFunctions.java with_timezone/at_timezone) ----

dual_sql_query(
    "fn_timezone_suite",
    """
    WITH t AS (
      SELECT o_orderkey, o_orderdate AS ts FROM orders WHERE o_orderkey <= 30
    )
    SELECT o_orderkey,
      with_timezone(ts, 'Asia/Kolkata').utc AS kolkata_utc,
      tz_wall(with_timezone(ts, 'Asia/Kolkata')) AS kolkata_roundtrip,
      tz_wall(tz_at_timezone(with_timezone(ts, 'America/New_York'),
                             'Europe/Paris')) AS ny_as_paris,
      CAST(with_timezone(TIMESTAMP_NTZ '2020-03-08 01:30:00',
                         'America/New_York').utc AS STRING) AS dst_before,
      CAST(with_timezone(TIMESTAMP_NTZ '2020-03-08 03:30:00',
                         'America/New_York').utc AS STRING) AS dst_after,
      tz_to_unixtime(with_timezone(TIMESTAMP_NTZ '2021-06-01 00:00:00',
                                   'Europe/Paris')) AS paris_epoch,
      tz_to_iso8601(with_timezone(TIMESTAMP_NTZ '2021-06-01 00:00:00',
                                  'Asia/Kolkata')) AS iso_kolkata
    FROM t ORDER BY o_orderkey
    """,
    """
    WITH t AS (
      SELECT o_orderkey, o_orderdate AS ts FROM orders WHERE o_orderkey <= 30
    )
    SELECT o_orderkey,
      timezone('UTC', timezone('Asia/Kolkata', ts)) AS kolkata_utc,
      ts AS kolkata_roundtrip,
      timezone('Europe/Paris', timezone('America/New_York', ts)) AS ny_as_paris,
      '2020-03-08 06:30:00' AS dst_before,
      '2020-03-08 07:30:00' AS dst_after,
      epoch(timezone('UTC', timezone('Europe/Paris',
            TIMESTAMP '2021-06-01 00:00:00'))) AS paris_epoch,
      '2021-06-01T00:00:00.000+05:30' AS iso_kolkata
    FROM t ORDER BY o_orderkey
    """,
    doc="TIMESTAMP WITH TIME ZONE model: STRUCT<utc, tz> values via "
        "with_timezone / tz_at_timezone / tz_wall / tz_to_unixtime / "
        "tz_to_iso8601 (TimestampWithTimeZoneType.java per-value zone; "
        "DateTimeFunctions.java at_timezone keeps the instant). Zones "
        "cover +5:30 (Kolkata), CET/CEST (Paris), and the US spring-"
        "forward DST boundary (EST→EDT offsets pinned as goldens); "
        "DuckDB ICU timezone() is the oracle.",
    tags=("functions", "datetime"),
)


# ---- incomplete-integral CDFs (reference: operator/scalar/
# MathFunctions.java betaCdf/binomialCdf/chiSquaredCdf/fCdf/gammaCdf/
# poissonCdf — commons-math distributions) ----

dual_sql_query(
    "fn_cdf_incomplete_suite",
    """
    SELECT n_nationkey,
      round(chi_squared_cdf(2, n_nationkey + 1.0), 8) AS chi2_df2,
      round(chi_squared_cdf(4, n_nationkey + 1.0), 8) AS chi2_df4,
      round(gamma_cdf(3.0, 2.0, n_nationkey + 1.0), 8) AS erlang3,
      round(poisson_cdf(2.0, CAST(n_nationkey % 5 AS DOUBLE)), 8) AS pois2,
      abs(binomial_cdf(10.0, 0.5, CAST(n_nationkey % 10 AS DOUBLE))
          - CAST(CASE n_nationkey % 10
              WHEN 0 THEN 1.0 WHEN 1 THEN 11.0 WHEN 2 THEN 56.0
              WHEN 3 THEN 176.0 WHEN 4 THEN 386.0 WHEN 5 THEN 638.0
              WHEN 6 THEN 848.0 WHEN 7 THEN 968.0 WHEN 8 THEN 1013.0
              ELSE 1023.0 END AS DOUBLE) / 1024.0) < 1e-12 AS binom_half,
      round(beta_cdf(2.0, 3.0, 0.1 * (n_nationkey % 10)), 8) AS beta23,
      round(f_cdf(2.0, 4.0, n_nationkey + 0.5), 8) AS f24,
      round(inverse_beta_cdf(2.0, 3.0,
              round(beta_cdf(2.0, 3.0, 0.1 * ((n_nationkey % 8) + 1)), 8)), 6)
        AS beta_roundtrip
    FROM nation WHERE n_nationkey < 10
    ORDER BY n_nationkey
    """,
    # DuckDB oracle: identical closed-form arithmetic (even-df chi2 and
    # Erlang gamma telescope to exp-polynomials; poisson/binomial/
    # integer-parameter beta are finite sums; F(2,4) reduces to
    # I_y(1,2) = 1 - (1-y)^2) — round(...,8) absorbs libm ulp diffs.
    """
    SELECT n_nationkey,
      round(1 - exp(-(n_nationkey + 1.0)/2), 8) AS chi2_df2,
      round(1 - exp(-(n_nationkey + 1.0)/2) * (1 + (n_nationkey + 1.0)/2), 8)
        AS chi2_df4,
      round(1 - exp(-(n_nationkey + 1.0)/2)
              * (1 + (n_nationkey + 1.0)/2
                   + power((n_nationkey + 1.0)/2, 2)/2), 8) AS erlang3,
      round(exp(-2.0) * (CASE n_nationkey % 5
              WHEN 0 THEN 1.0
              WHEN 1 THEN 3.0
              WHEN 2 THEN 5.0
              WHEN 3 THEN 19.0/3
              ELSE 7.0 END), 8) AS pois2,
      true AS binom_half,
      round((SELECT sum(CASE
               WHEN j >= 2 THEN (CASE j WHEN 2 THEN 6.0 WHEN 3 THEN 4.0
                                        ELSE 1.0 END)
                 * power(0.1 * (n_nationkey % 10), j)
                 * power(1 - 0.1 * (n_nationkey % 10), 4 - j)
               ELSE 0.0 END)
             FROM (SELECT unnest(range(0, 5)) AS j)), 8) AS beta23,
      round(1 - power(4.0 / (2 * (n_nationkey + 0.5) + 4), 2), 8) AS f24,
      CAST(round(0.1 * ((n_nationkey % 8) + 1), 6) AS DOUBLE) AS beta_roundtrip
    FROM nation WHERE n_nationkey < 10
    ORDER BY n_nationkey
    """,
    doc="Incomplete-integral CDFs (MathFunctions.java): regularized "
        "incomplete gamma/beta via series + modified-Lentz continued "
        "fractions (functions/stats.py), Arrow-batched. Oracle uses "
        "independent closed forms: even-df chi-squared and Erlang gamma "
        "exp-polynomials, exact poisson/binomial partial sums, the "
        "integer-parameter beta-binomial identity, F(2,4) -> I_y(1,2), "
        "and a beta quantile round-trip.",
    tags=("functions", "math"),
)


# ---- binary tail: HMAC / IEEE 754 / murmur3 (reference:
# HmacFunctions.java, VarbinaryFunctions.java:250-307; golden values =
# the reference's own test vectors, TestVarbinaryFunctions.java:348-349
# and :475-501) ----

dual_sql_query(
    "fn_binary_suite2",
    """
    WITH t AS (SELECT stack(2, 0, '', 1, 'hashme') AS (i, msg))
    SELECT
      i,
      upper(hex(hmac_md5(encode(msg, 'UTF-8'), encode('key', 'UTF-8'))))
        AS h_md5,
      upper(hex(hmac_sha1(encode(msg, 'UTF-8'), encode('key', 'UTF-8'))))
        AS h_sha1,
      upper(hex(hmac_sha256(encode(msg, 'UTF-8'), encode('key', 'UTF-8'))))
        AS h_sha256,
      upper(hex(hmac_sha512(encode(msg, 'UTF-8'), encode('key', 'UTF-8'))))
        AS h_sha512,
      upper(hex(murmur3_x64_128(encode(msg, 'UTF-8')))) AS h_mm3,
      upper(hex(spooky_hash_v2_64(encode(msg, 'UTF-8')))) AS h_sp64,
      upper(hex(spooky_hash_v2_32(encode(msg, 'UTF-8')))) AS h_sp32,
      to_base32(encode(msg, 'UTF-8')) AS b32,
      decode(from_base32(to_base32(encode(msg, 'UTF-8'))), 'UTF-8') AS b32_rt,
      upper(hex(to_ieee754_64(cast(i AS DOUBLE) + 0.5))) AS i64_hex,
      upper(hex(to_ieee754_32(cast(cast(i AS FLOAT) + 0.5 AS FLOAT))))
        AS i32_hex,
      (from_ieee754_64(to_ieee754_64(cast(i AS DOUBLE) * 2.718281828459045))
        = cast(i AS DOUBLE) * 2.718281828459045) AS rt64_ok,
      (from_ieee754_32(to_ieee754_32(cast(1.5 AS FLOAT)))
        = cast(1.5 AS FLOAT)) AS rt32_ok,
      fnv1_32(encode(msg, 'UTF-8')) AS fnv32,
      fnv1_64(encode(msg, 'UTF-8')) AS fnv64,
      fnv1a_32(encode(msg, 'UTF-8')) AS fnv32a,
      fnv1a_64(encode(msg, 'UTF-8')) AS fnv64a,
      crc32(encode(msg, 'UTF-8')) AS crc
    FROM t ORDER BY i
    """,
    """
    SELECT * FROM (VALUES
      (0,
       '63530468A04E386459855DA0063B6596',
       'F42BB0EEB018EBBD4597AE7213711EC60760843F',
       '5D5D139563C95B5967B9BD9A8C9B233A9DEDB45072794CD232DC1B74832607D0',
       '84FA5AA0279BBC473267D05A53EA03310A987CECC4C1535FF29B6D76B8F1444A728DF3AADB89D4A9A6709E1998F373566E8F824A8CA93B1821F0B69BC2A2F65E',
       '00000000000000000000000000000000',
       '232706FC6BF50919', '6BF50919', '', '',
       '3FE0000000000000', '3F000000', true, true,
       -2128831035, CAST(-3750763034362895579 AS BIGINT),
       -2128831035, CAST(-3750763034362895579 AS BIGINT),
       CAST(0 AS BIGINT)),
      (1,
       '0A26EBEB0E7B65F528D96F7BC631BC8F',
       '2E7C4C6AEFA7E69F106EEE3CE21944D0046D2F3D',
       'D3D72F9FACDE059DA3A4EB43A9ABDD4B35118E0FEF00E6D16FB04BB332AF0484',
       'FEFA712B67DED871E1ED987F8B20D6A69EB9FCC87974218B9A1A6D5202B54C18ECDA4839A979DED22F07E0881CF40B762691992D120408F49D6212E112509D72',
       '93192FE805BE23041C8318F67EC4F2BC',
       'EC588E792BA05291', '2BA05291', 'NBQXG2DNMU======', 'hashme',
       '3FF8000000000000', '3FC00000', true, true,
       1186288931, CAST(-8283365273186809917 AS BIGINT),
       1585780803, CAST(4520530899586740515 AS BIGINT),
       CAST(603088830 AS BIGINT))
    ) AS v(i, h_md5, h_sha1, h_sha256, h_sha512, h_mm3, h_sp64, h_sp32,
           b32, b32_rt, i64_hex, i32_hex, rt64_ok, rt32_ok, fnv32, fnv64, fnv32a, fnv64a, crc)
    ORDER BY i
    """,
    doc="HMAC family (HmacFunctions.java: RFC 2104 over md5/sha1/"
        "sha256/sha512), murmur3_x64_128 (VarbinaryFunctions.java:302 "
        "= MurmurHash3_x64_128), SpookyHash V2 32/64 "
        "(VarbinaryFunctions.java:385-388 vectors), base32 round-trip "
        "(:146-163), and the big-endian IEEE 754 codecs "
        "(to/from_ieee754_32/64, :250-290). The oracle rows ARE the "
        "reference's test vectors (TestVarbinaryFunctions.java), so "
        "this checks byte-for-byte parity with upstream, not just "
        "DuckDB agreement.",
    tags=("functions", "binary"),
)


# ---- scalar-function tail: codecs / json / interval / ip / cauchy
# (VarbinaryFunctions.java base64url + big-endian, JsonFunctions.java,
# DateTimeFunctions.java toMilliseconds, MathFunctions.java
# inverseCauchyCdf, IpAddressFunctions isPrivateIp,
# SimpleSamplingPercent) ----

dual_sql_query(
    "fn_misc_scalar_tail",
    """
    SELECT
      decode(from_base64url(to_base64url(encode('hi?>~', 'UTF-8'))),
             'UTF-8') AS b64url_rt,
      to_base64url(encode('hi?>~', 'UTF-8')) AS b64url,
      upper(hex(to_big_endian_32(-2))) AS be32_hex,
      from_big_endian_32(to_big_endian_32(-123456)) AS be32_rt,
      from_big_endian_64(to_big_endian_64(-98765432109)) AS be64_rt,
      round(inverse_cauchy_cdf(2.0, 3.0, 0.75), 9) AS icc,
      to_milliseconds(INTERVAL '1 02:03:04.25' DAY TO SECOND) AS iv_ms,
      is_json_scalar('  42 ') AS js_num,
      is_json_scalar('"ab"') AS js_str,
      is_json_scalar('[1]') AS js_arr,
      json_array_get('[10, 20, 30]', 1) AS jag_pos,
      json_array_get('[10, 20, 30]', -1) AS jag_neg,
      json_array_contains('[1, 2, 3]', '2') AS jac_hit,
      json_array_contains('[1, 2, 3]', '9') AS jac_miss,
      is_private_ip('192.168.1.5') AS ip_rfc1918,
      is_private_ip('172.20.0.1') AS ip_172,
      is_private_ip('172.32.0.1') AS ip_pub_172,
      is_private_ip('8.8.8.8') AS ip_pub,
      key_sampling_percent('hello') >= 0.0
        AND key_sampling_percent('hello') < 1.0 AS ksp_ok,
      uuid() rlike
        '^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$'
        AS uuid_v4,
      current_timezone() AS tz
    """,
    """
    SELECT
      'hi?>~' AS b64url_rt,
      'aGk_Pn4=' AS b64url,
      'FFFFFFFE' AS be32_hex,
      -123456 AS be32_rt,
      CAST(-98765432109 AS BIGINT) AS be64_rt,
      round(2.0 + 3.0 * tan(pi() * 0.25), 9) AS icc,
      CAST(93784250 AS BIGINT) AS iv_ms,
      true AS js_num, true AS js_str, false AS js_arr,
      '20' AS jag_pos, '30' AS jag_neg,
      true AS jac_hit, false AS jac_miss,
      true AS ip_rfc1918, true AS ip_172,
      false AS ip_pub_172, false AS ip_pub,
      true AS ksp_ok,
      true AS uuid_v4,
      'UTC' AS tz
    """,
    doc="Scalar tail battery: base64url round-trip, big-endian 32/64 "
        "two's-complement codecs, inverse_cauchy_cdf (DuckDB replays "
        "the closed form), interval→milliseconds, is_json_scalar / "
        "json_array_get (negative index) / json_array_contains, "
        "is_private_ip (RFC1918 boundaries incl. the 172.16/12 edge), "
        "and the key_sampling_percent range contract.",
    tags=("functions", "binary", "json"),
)


# ---- IP prefix tail (IpPrefixFunctions.java ipSubnetRange /
# ipPrefixSubnets / ipPrefixCollapse; IPv4 string model) ----

dual_sql_query(
    "fn_ip_prefix_suite2",
    """
    SELECT
      array_join(ip_subnet_range('192.168.1.0/24'), ',') AS rng,
      array_join(ip_prefix_subnets('192.168.0.0/22', 24), ',') AS subs,
      size(ip_prefix_subnets('192.168.0.0/24', 22)) AS subs_invalid_n,
      array_join(ip_prefix_collapse(
        array('192.168.0.0/24', '192.168.1.0/24')), ',') AS merge_adj,
      array_join(ip_prefix_collapse(
        array('10.0.0.0/8', '10.1.0.0/16')), ',') AS merge_contained,
      array_join(ip_prefix_collapse(
        array('192.168.0.0/24', '192.168.2.0/24')), ',') AS keep_gap,
      array_join(ip_prefix_collapse(
        array('192.168.0.0/24', '192.168.1.0/25')), ',') AS uneven_cover,
      array_join(ip_prefix_collapse(array('0.0.0.0/0')), ',') AS whole_v4,
      is_private_ip('100.64.0.1') AS priv_cgn,
      is_private_ip('198.18.0.1') AS priv_bench,
      is_private_ip('240.0.0.1') AS priv_reserved,
      is_private_ip('2001:db8::9') AS priv_doc6,
      is_private_ip('fe9f::1') AS priv_ll6,
      is_private_ip('172.32.0.1') AS pub_172,
      is_private_ip('fec0::1') AS pub_v6
    """,
    """
    SELECT
      '192.168.1.0,192.168.1.255' AS rng,
      '192.168.0.0/24,192.168.1.0/24,192.168.2.0/24,192.168.3.0/24'
        AS subs,
      0 AS subs_invalid_n,
      '192.168.0.0/23' AS merge_adj,
      '10.0.0.0/8' AS merge_contained,
      '192.168.0.0/24,192.168.2.0/24' AS keep_gap,
      '192.168.0.0/24,192.168.1.0/25' AS uneven_cover,
      '0.0.0.0/0' AS whole_v4,
      true AS priv_cgn,
      true AS priv_bench,
      true AS priv_reserved,
      true AS priv_doc6,
      true AS priv_ll6,
      false AS pub_172,
      false AS pub_v6
    """,
    doc="ip_subnet_range / ip_prefix_subnets / ip_prefix_collapse "
        "(IpPrefixFunctions.java): subdivision, adjacent-/24 merge to "
        "/23, containment swallow, gap preservation, the uneven "
        "/24+/25 minimal cover, and the 0.0.0.0/0 whole-space edge "
        "(the greedy range->CIDR fold's cur=0 lowest-set-bit guard); "
        "plus is_private_ip over the full privatePrefixes list "
        "(IpPrefixFunctions.java:64-90 — CGN, benchmarking, class-E, "
        "IPv6 documentation and fe9x link-local ranges the old regex "
        "missed, ADVICE r6).",
    tags=("functions", "ip"),
)


dual_sql_query(
    "fn_bitwise_shift_suite",
    """
    SELECT
      bitwise_left_shift(7, 2) AS ls, bitwise_left_shift(-7, 2) AS ls_neg,
      bitwise_right_shift(7, 2) AS rs,
      bitwise_right_shift(-8, 2) AS rs_neg,
      bitwise_right_shift_arithmetic(-8, 2) AS rsa,
      bitwise_arithmetic_shift_right(-8, 2) AS asr,
      bitwise_shift_left(7, 2, 4) AS sl4,
      bitwise_shift_left(7, 2, 64) AS sl64,
      bitwise_logical_shift_right(7, 2, 4) AS lsr4,
      bitwise_logical_shift_right(-8, 2, 5) AS lsr5,
      bitwise_left_shift(1, 64) AS ls_sat,
      bitwise_right_shift(-1, 70) AS rs_sat,
      bitwise_right_shift_arithmetic(12, 64) AS rsa_sat_pos,
      bitwise_right_shift_arithmetic(-45, 64) AS rsa_sat_neg
    """,
    """
    SELECT
      CAST(28 AS BIGINT) AS ls, CAST(-28 AS BIGINT) AS ls_neg,
      CAST(1 AS BIGINT) AS rs,
      CAST(4611686018427387902 AS BIGINT) AS rs_neg,
      CAST(-2 AS BIGINT) AS rsa,
      CAST(-2 AS BIGINT) AS asr,
      CAST(12 AS BIGINT) AS sl4,
      CAST(28 AS BIGINT) AS sl64,
      CAST(1 AS BIGINT) AS lsr4,
      CAST(6 AS BIGINT) AS lsr5,
      CAST(0 AS BIGINT) AS ls_sat,
      CAST(0 AS BIGINT) AS rs_sat,
      CAST(0 AS BIGINT) AS rsa_sat_pos,
      CAST(-1 AS BIGINT) AS rsa_sat_neg
    """,
    doc="Bitwise shift battery (BitwiseFunctions.java; every worked "
        "example from bitwise.rst at the BIGINT tier): generic "
        "left/logical-right/arithmetic-right shifts plus the 3-arg "
        "bits-wide register forms, incl. the shift>=64 saturation "
        "(0 / sign-extended) the reference applies but Spark's "
        "mod-64 builtins do not (ADVICE r6).",
    tags=("functions", "bitwise"),
)


dual_sql_query(
    "fn_color_bar_golden",
    """
    SELECT
      color('#f00') AS c_hex,
      color('red') AS c_red,
      color('green') AS c_green,
      color('nonsense') IS NULL AS c_bad_null,
      color('#xyz') IS NULL AS c_badhex_null,
      rgb(255, 0, 0) AS rgb_red,
      rgb(300, 0, 0) IS NULL AS rgb_range_null,
      color_interp(0.0, rgb(255,0,0), rgb(0,255,0)) AS i_lo,
      color_interp(0.5, rgb(255,0,0), rgb(0,255,0)) AS i_mid,
      color_interp(1.0, rgb(255,0,0), rgb(0,255,0)) AS i_hi,
      color_interp(0.5, color('red'), rgb(0,255,0)) IS NULL
        AS i_sys_null,
      color_scaled(50.0, 0.0, 100.0, rgb(255,0,0), rgb(0,255,0))
        AS i_scaled,
      replace(render('x', color('red')), chr(27), '<E>') AS r_str,
      replace(render_num(42, rgb(0,255,0)), chr(27), '<E>') AS r_num,
      replace(render_bool(true), chr(27), '<E>') AS r_true,
      replace(render_bool(false), chr(27), '<E>') AS r_false,
      replace(bar(0.5, 10), chr(27), '<E>') AS bar_half,
      replace(bar(-0.5, 4), chr(27), '<E>') AS bar_neg,
      replace(bar(2.0, 3), chr(27), '<E>') AS bar_over,
      replace(bar_colored(1.0, 4, rgb(0,0,255), rgb(255,0,255)),
              chr(27), '<E>') AS bar_bm
    """,
    """
    SELECT
      CAST(16711680 AS BIGINT) AS c_hex,
      CAST(-2 AS BIGINT) AS c_red,
      CAST(-3 AS BIGINT) AS c_green,
      true AS c_bad_null,
      true AS c_badhex_null,
      CAST(16711680 AS BIGINT) AS rgb_red,
      true AS rgb_range_null,
      CAST(16711680 AS BIGINT) AS i_lo,
      CAST(16776960 AS BIGINT) AS i_mid,
      CAST(65280 AS BIGINT) AS i_hi,
      true AS i_sys_null,
      CAST(16776960 AS BIGINT) AS i_scaled,
      '<E>[38;5;1mx<E>[0m' AS r_str,
      '<E>[38;5;46m42<E>[0m' AS r_num,
      '<E>[38;5;2m' || chr(10003) || '<E>[0m' AS r_true,
      '<E>[38;5;1m' || chr(10007) || '<E>[0m' AS r_false,
      '<E>[38;5;196m' || chr(9608) || '<E>[38;5;202m' || chr(9608)
        || '<E>[38;5;208m' || chr(9608) || '<E>[38;5;214m' || chr(9608)
        || '<E>[38;5;226m' || chr(9608) || '<E>[0m     ' AS bar_half,
      '<E>[0m    ' AS bar_neg,
      '<E>[38;5;196m' || chr(9608) || '<E>[38;5;226m' || chr(9608)
        || '<E>[38;5;46m' || chr(9608) || '<E>[0m' AS bar_over,
      '<E>[38;5;21m' || chr(9608) || '<E>[38;5;57m' || chr(9608)
        || '<E>[38;5;129m' || chr(9608) || '<E>[38;5;201m' || chr(9608)
        || '<E>[0m' AS bar_bm
    """,
    doc="Color/bar terminal tier (ColorFunctions.java — functions/"
        "color.py): '#rgb' CSS nibble replication + system-color "
        "encoding -(index+1), rgb packing with range pins, HSB "
        "interpolation (red→green midpoint = yellow 16776960, exactly "
        "the reference's java.awt HSB path), ANSI 256-color render "
        "escapes (6x6x6 cube toAnsi), render(boolean) green-check/"
        "red-cross, and the bar gradient with truncation clamping "
        "(half bar, negative → all padding, >1 → full bar) plus a "
        "custom blue→magenta ramp.  ESC sanitized to '<E>' for the "
        "differential hash; expected strings are hand-derived from "
        "the reference algorithm.",
    tags=("functions",),
)
