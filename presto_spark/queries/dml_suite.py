"""DML round-trip query: CTAS → DELETE → UPDATE, oracle-checked.

The driver's contract wants a DataFrame per query; here the DataFrame
is the summary of a table that went through the copy-on-write DML path
(operators/dml.py), and the DuckDB oracle recomputes the expected
post-DML state declaratively — DELETE as a filter, UPDATE as a CASE.
That is exactly how Presto's own tests verify DML connectors
(row-count + content assertions after mutation).
"""

import tempfile

from pyspark.sql import functions as F

from presto_spark.operators.dml import ParquetTable
from presto_spark.queries.base import prepare, register


@register(
    "dml_cow_roundtrip",
    oracle="""
    WITH base AS (
      SELECT * FROM orders WHERE o_custkey % 100 = 0
    ),
    after_delete AS (
      SELECT * FROM base WHERE NOT (o_orderstatus = 'F')
    ),
    after_update AS (
      SELECT CASE WHEN o_totalprice > 100000.0 THEN 'URGENT-BIG'
                  ELSE o_orderpriority END AS pri,
             o_totalprice
      FROM after_delete
    )
    SELECT count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total,
           count(*) FILTER (WHERE pri = 'URGENT-BIG') AS n_big
    FROM after_update
    """,
    doc="Copy-on-write DML chain (operators/dml.py ParquetTable): CTAS a "
        "subset of orders, DELETE WHERE status='F', UPDATE priority of "
        "big orders, then summarize. Reference: DeleteOperator.java, "
        "UpdateOperator.java, TableWriterOperator.java; oracle recomputes "
        "the post-DML state declaratively.",
    tags=("dml",),
)
def dml_cow_roundtrip(spark, sf_dir):
    prepare(spark, sf_dir)
    base = spark.table("orders").where(F.col("o_custkey") % 100 == 0)
    path = tempfile.mkdtemp(prefix="presto_spark_dml_") + "/t"
    t = ParquetTable.create_as(spark, path, base)
    t.delete_where(F.col("o_orderstatus") == "F")
    t.update(
        F.col("o_totalprice") > 100000.0,
        {"o_orderpriority": F.lit("URGENT-BIG")},
    )
    return t.read().agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double")
        .alias("total"),
        F.count_if(F.col("o_orderpriority") == "URGENT-BIG").alias("n_big"),
    )
