"""Query registry plumbing.

Mirrors the reference's differential-test protocol: the same logical query
runs on the engine and on an oracle database, results diffed
(reference: presto-tests/.../QueryAssertions.java:132 assertQuery with the
H2QueryRunner oracle, AbstractTestQueryFramework.java:106-109).  Our
oracle is DuckDB over the same parquet files.

Determinism conventions (so order-insensitive value hashes match):

* Money/double aggregations go through exact DECIMAL casts
  (``DEC2 = DECIMAL(12,2)`` for raw columns, factors as DECIMAL(4,2))
  and only the final value is cast back to DOUBLE — IEEE summation order
  then cannot perturb the result.
* Every computed column is aliased identically in the Spark and oracle
  text.
* count()/sum(bigint) outputs are cast to BIGINT in the oracle (DuckDB
  widens sums to HUGEINT, Spark keeps BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from presto_spark.sources.catalog import register_tables


@dataclass
class Query:
    """One engine query + its DuckDB oracle (None → rows-only check)."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(name, oracle, doc="", tags=()):
    """Decorator: register fn(spark, sf_dir) -> DataFrame as a Query."""

    def deco(fn):
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc, tags=tuple(tags))
        return fn

    return deco


def sql_query(name, spark_sql, oracle=None, doc="", tags=()):
    """Register a SQL-defined query; oracle defaults to the same text.

    Most relational queries are plain ANSI SQL that parses identically in
    Spark and DuckDB — write it once.  Pass ``oracle`` explicitly when the
    dialects diverge.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(spark_sql)

    fn.__name__ = name
    fn.__doc__ = doc or spark_sql
    REGISTRY[name] = Query(
        name=name, spark=fn, oracle=spark_sql if oracle is None else oracle,
        doc=doc, tags=tuple(tags),
    )
    return fn
