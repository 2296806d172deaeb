"""End-to-end Presto-dialect queries through the Engine.sql translate path.

These queries are written in PRESTO spellings (date_add('unit', n, ts),
approx_distinct, arbitrary, cardinality, 1-based subscripts, TRY(CAST))
and run through functions/dialect.py translate() — proving the dialect
layer on whole queries, not just unit tests.  The DuckDB oracle is
written directly in DuckDB's dialect.
"""

from pyspark.sql import SparkSession

from presto_spark.functions.dialect import translate
from presto_spark.queries.base import prepare, register


def _presto_sql(name, presto_text, duck_text, doc, tags):
    def fn(spark: SparkSession, sf_dir: str):
        prepare(spark, sf_dir)
        return spark.sql(translate(presto_text))

    fn.__name__ = name
    register(name, oracle=duck_text, doc=doc, tags=tags)(fn)
    return fn


_presto_sql(
    "presto_dialect_revenue_window",
    # --- Presto dialect ---
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CASE WHEN abs(approx_distinct(o_custkey) - count(DISTINCT o_custkey))
                     <= 0.10 * count(DISTINCT o_custkey)
                THEN true ELSE false END AS approx_ok,
           count(DISTINCT o_custkey) AS exact_customers,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate >= date_add('month', 6, TIMESTAMP '1995-01-01 00:00:00')
      AND o_orderdate < date_add('year', 2, TIMESTAMP '1995-07-01 00:00:00')
    GROUP BY o_orderpriority
    HAVING count(*) > 10
    ORDER BY o_orderpriority
    """,
    # --- DuckDB oracle (approx column pinned as its envelope boolean) ---
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           true AS approx_ok,
           count(DISTINCT o_custkey) AS exact_customers,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' + INTERVAL 6 MONTH
      AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00' + INTERVAL 2 YEAR
    GROUP BY o_orderpriority
    HAVING count(*) > 10
    ORDER BY o_orderpriority
    """,
    doc="Presto-spelled aggregation (date_add unit spelling, "
        "approx_distinct) through Engine's translate path; the approx "
        "column asserts a 10% envelope in-query (2 sigma at Spark's "
        "default 5% rsd), exact columns hash.",
    tags=("dialect",),
)


_presto_sql(
    "presto_dialect_array_ops",
    # --- Presto dialect: 1-based subscripts, cardinality, TRY(CAST) ---
    """
    WITH t AS (
      SELECT n_nationkey,
             split(n_name, '_') AS parts
      FROM nation
    )
    SELECT n_nationkey,
           parts[1] AS prefix,
           parts[2] AS num_text,
           TRY(CAST(parts[2] AS INTEGER)) AS num,
           cardinality(parts) AS n_parts
    FROM t
    ORDER BY n_nationkey
    """,
    """
    WITH t AS (
      SELECT n_nationkey, string_split(n_name, '_') AS parts
      FROM nation
    )
    SELECT n_nationkey,
           parts[1] AS prefix,
           parts[2] AS num_text,
           TRY_CAST(parts[2] AS INTEGER) AS num,
           len(parts) AS n_parts
    FROM t
    ORDER BY n_nationkey
    """,
    doc="Presto array semantics end-to-end: 1-based subscript -> "
        "element_at rewrite, cardinality -> size, TRY(CAST) -> "
        "TRY_CAST. DuckDB lists are natively 1-based — same values.",
    tags=("dialect",),
)
