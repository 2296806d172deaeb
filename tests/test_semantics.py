"""Semantic-trap conformance (SURVEY §2.8 "traps to encode in tests").

Each test pins the engine's chosen semantics for the areas where
Presto and Spark genuinely differ — 1-based subscripts, out-of-bounds
behavior, NaN ordering, integer division, decimal scale, null sort
order — so a future config change that silently flips one fails loudly.
Presto behavior citations: presto-main-base/.../operator/scalar/
ArraySubscriptOperator.java (fail on OOB), MathFunctions.java,
presto-docs/.../language/types.rst.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _one(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_array_subscript_is_one_based(spark):
    """Presto arr[1] is the first element (ArraySubscriptOperator.java);
    Spark SQL's arr[i] is 0-based — the engine's documented deviation is
    to use element_at (1-based, Presto-compatible) in the dialect."""
    assert _one(spark, "element_at(array(10, 20, 30), 1)") == 10
    assert _one(spark, "element_at(array(10, 20, 30), -1)") == 30


def test_element_at_out_of_bounds_is_null_not_error(spark):
    """Presto arr[9] raises; Spark element_at returns NULL under
    ansi.enabled=false. Engine choice: NULL (permissive mode) —
    documented deviation, pinned here."""
    assert _one(spark, "element_at(array(1, 2), 9)") is None


def test_integer_division_truncates(spark):
    assert _one(spark, "7 div 2") == 3
    assert _one(spark, "-7 div 2") == -3  # toward zero, like Presto


def test_division_by_zero_is_null_not_error(spark):
    """Presto raises DIVISION_BY_ZERO; ANSI-off Spark yields NULL.
    Engine choice: NULL (pinned; try_divide gives the same explicitly)."""
    assert _one(spark, "1 / 0") is None
    assert _one(spark, "try_divide(1, 0)") is None


def test_nan_sorts_greater_than_all(spark):
    """Both engines order NaN last ascending (Presto: NaN largest)."""
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (2.0,)], "v double"
    ).orderBy("v")
    vals = [r.v for r in df.collect()]
    assert vals[0] == 1.0 and vals[1] == 2.0 and math.isnan(vals[2])


def test_nan_equals_itself_in_group_and_join(spark):
    """Spark (and Presto) treat NaN = NaN inside GROUP BY/DISTINCT."""
    df = spark.createDataFrame([(float("nan"),), (float("nan"),)], "v double")
    assert df.distinct().count() == 1


def test_nulls_sort_first_asc_last_desc(spark):
    """Spark default: NULLS FIRST ascending. Presto defaults to NULLS
    LAST — queries needing Presto order must say NULLS LAST explicitly
    (our suites always pin null ordering in ORDER BY)."""
    df = spark.createDataFrame([(None,), (1,)], "v int")
    assert [r.v for r in df.orderBy("v").collect()] == [None, 1]
    assert [r.v for r in df.orderBy(F.col("v").desc()).collect()] == [1, None]


def test_decimal_division_scale(spark):
    """DECIMAL(p,s) division: Spark widens scale like Presto's rules
    (result scale >= 6 here); value must be exact."""
    v = _one(spark, "CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2))")
    assert str(v).startswith("0.333333")


def test_timestamp_is_zoneless(spark):
    """Engine reads parquet TIMESTAMP as TIMESTAMP_NTZ (Presto's
    zone-less TIMESTAMP semantics — TimestampType.java); no session-zone
    shifting on read."""
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp_ntz"


def test_cast_string_to_int_invalid_is_null(spark):
    """ANSI off: invalid casts → NULL (Presto raises; TRY(CAST) in the
    dialect maps to the same NULL). Pinned engine-wide."""
    assert _one(spark, "CAST('abc' AS INTEGER)") is None


def test_substr_negative_start_counts_from_end(spark):
    assert _one(spark, "substr('hello', -3)") == "llo"


def test_concat_null_propagates(spark):
    """Presto concat(NULL, x) → NULL; Spark agrees."""
    assert _one(spark, "concat('a', CAST(NULL AS STRING))") is None


def test_map_duplicate_keys_last_wins(spark):
    """Presto map_concat keeps the last value for duplicate keys
    (MapConcatFunction.java); the engine pins
    spark.sql.mapKeyDedupPolicy=LAST_WIN to match (Spark's default
    throws)."""
    (row,) = spark.sql(
        "SELECT map_concat(map('a', 1), map('a', 9))['a'] AS v"
    ).collect()
    assert row.v == 9


def test_decimal_to_bigint_truncates(spark):
    """DEVIATION: Spark casts DECIMAL→BIGINT by truncation toward zero;
    Presto rounds half-up. Pinned so the behavior is deliberate and
    documented (fn_decimal_cast_suite oracle truncates explicitly)."""
    assert _one(spark, "CAST(CAST(2.9 AS DECIMAL(3,1)) AS BIGINT)") == 2
    assert _one(spark, "CAST(CAST(-2.9 AS DECIMAL(3,1)) AS BIGINT)") == -2
