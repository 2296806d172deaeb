"""Engine facade tests: Presto-dialect SQL, SET SESSION, EXPLAIN."""

from __future__ import annotations

import pytest

from presto_spark.engine import Engine
from presto_spark.session_properties import set_session_property
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, sf_dir=SF_DIR)


def test_presto_spellings_translate(eng):
    row = eng.sql(
        "SELECT approx_distinct(l_partkey) AS ad,"
        "       cardinality(array(1, 2, 3)) AS card,"
        "       arbitrary(l_returnflag) AS arb,"
        "       strpos('hello', 'll') AS pos "
        "FROM lineitem"
    ).collect()[0]
    assert row.card == 3 and row.pos == 3 and row.ad > 0


def test_presto_date_add_reshuffle(eng):
    row = eng.sql(
        "SELECT date_add('day', 3, TIMESTAMP '1995-01-01 00:00:00') AS d"
    ).collect()[0]
    assert str(row.d).startswith("1995-01-04")


def test_set_session_property_roundtrip(eng):
    eng.sql("SET SESSION hash_partition_count = 17")
    assert eng.spark.conf.get("spark.sql.shuffle.partitions") == "17"
    eng.sql("SET SESSION hash_partition_count = 16")


def test_set_session_join_distribution(eng):
    eng.sql("SET SESSION join_distribution_type = 'PARTITIONED'")
    assert eng.spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    eng.sql("SET SESSION join_distribution_type = 'AUTOMATIC'")


def test_unknown_session_property_raises(spark):
    with pytest.raises(ValueError, match="unsupported session property"):
        set_session_property(spark, "no_such_knob", "1")


def test_explain_surface(eng):
    plan = eng.explain_str("SELECT count(*) AS n FROM lineitem")
    assert "Physical Plan" in plan or "HashAggregate" in plan


def test_try_cast_rewrite(eng):
    row = eng.sql("SELECT TRY(CAST('abc' AS INTEGER)) AS x").collect()[0]
    assert row.x is None
