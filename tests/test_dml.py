"""Tests for the DML/DDL surface (operators/dml.py + Engine.sql DDL)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_spark.operators.dml import ParquetTable


@pytest.fixture()
def tbl(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id int, name string, amount double",
    )
    return ParquetTable.create_as(spark, str(tmp_path / "t"), df)


def test_ctas_roundtrip(tbl):
    assert tbl.read().count() == 4


def test_insert_appends(tbl, spark):
    tbl.insert(spark.createDataFrame([(5, "e", 50.0)], "id int, name string, amount double"))
    assert tbl.read().count() == 5


def test_delete_where(tbl):
    n = tbl.delete_where(F.col("amount") > 25)
    assert n == 2
    assert sorted(r.id for r in tbl.read().collect()) == [1, 2]


def test_delete_null_cond_keeps_row(spark, tmp_path):
    df = spark.createDataFrame([(1, None), (2, 5.0)], "id int, v double")
    t = ParquetTable.create_as(spark, str(tmp_path / "t2"), df)
    # v > 3 is NULL for row 1 → row 1 must survive (Presto semantics).
    assert t.delete_where(F.col("v") > 3) == 1
    assert [r.id for r in t.read().collect()] == [1]


def test_update(tbl):
    tbl.update(F.col("id") == 2, {"amount": F.col("amount") * 2})
    rows = {r.id: r.amount for r in tbl.read().collect()}
    assert rows[2] == 40.0 and rows[1] == 10.0


def test_merge_update_and_insert(tbl, spark):
    src = spark.createDataFrame(
        [(3, "c2", 99.0), (9, "z", 1.0)], "id int, name string, amount double"
    )
    tbl.merge(
        src, on=["id"],
        when_matched_update={"name": F.col("s.name"), "amount": F.col("s.amount")},
    )
    rows = {r.id: (r.name, r.amount) for r in tbl.read().collect()}
    assert rows[3] == ("c2", 99.0)      # matched → updated
    assert rows[9] == ("z", 1.0)        # not matched → inserted
    assert rows[1] == ("a", 10.0)       # untouched passthrough
    assert len(rows) == 5


def test_merge_no_insert(tbl, spark):
    src = spark.createDataFrame(
        [(1, "a2", 11.0), (9, "z", 1.0)], "id int, name string, amount double"
    )
    tbl.merge(
        src, on=["id"],
        when_matched_update={"amount": F.col("s.amount")},
        when_not_matched_insert=False,
    )
    rows = {r.id: r.amount for r in tbl.read().collect()}
    assert rows[1] == 11.0
    assert 9 not in rows and len(rows) == 4


def test_insert_overwrite(tbl, spark):
    tbl.insert_overwrite(
        spark.createDataFrame([(7, "x", 1.0)], "id int, name string, amount double")
    )
    assert [r.id for r in tbl.read().collect()] == [7]


def test_sql_ddl_view_surface(spark):
    """CREATE VIEW / DROP VIEW through plain Spark SQL (Presto's DDL
    grammar subset that needs no connector)."""
    spark.range(5).createOrReplaceTempView("ddl_base")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ddl_v AS SELECT id * 2 AS x FROM ddl_base")
    assert spark.sql("SELECT sum(x) AS s FROM ddl_v").collect()[0].s == 20
    spark.sql("DROP VIEW ddl_v")
