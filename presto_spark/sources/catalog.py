"""Table registration — the engine's "connector" layer.

Presto exposes tables through connector metadata (reference:
presto-spi/src/main/java/com/facebook/presto/spi/ConnectorMetadata.java;
TPC-H test connector presto-tpch/.../TpchMetadata.java).  In Spark the
catalog + DataSource V2 fill that role: ``spark.read.parquet`` gives us
vectorized scans with predicate pushdown, column pruning, and partition
pruning for free (Presto needed TupleDomain plumbing for this —
presto-common/.../predicate/TupleDomain.java:48).

At 100 TB the same call reads a partitioned/bucketed table directory; the
registration below is path-based only because the driver testdata is flat
parquet files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-generated star schema + event + LLM-data tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # The generator has shipped ts as either TIMESTAMP(NANOS)
        # (surfacing as BIGINT nanos via session.py nanosAsLong) or
        # plain timestamp[us]; normalize both to TIMESTAMP_NTZ µs plus
        # a raw-nanos BIGINT ts_ns.  Window orderings use ts_ns for
        # exact cross-engine ordering (DuckDB: epoch_ns(ts) matches).
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = (
                df.withColumn("ts_ns", F.col("ts"))
                .withColumn(
                    "ts",
                    F.timestamp_micros(
                        F.floor(F.col("ts") / F.lit(1000)).cast("long")
                    ).cast("timestamp_ntz"),
                )
            )
        else:
            df = df.withColumn(
                "ts", F.col("ts").cast("timestamp_ntz")
            ).withColumn(
                "ts_ns",
                (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast(
                    "long"
                ),
            )
    return df


def register_tables(spark: SparkSession, sf_dir: str, tables=TABLES) -> dict[str, DataFrame]:
    """Register each parquet table as a temp view; returns name→DataFrame.

    Temp views keep the scan lazy: Catalyst prunes columns and pushes
    filters into the parquet reader per-query, so registering all tables
    costs nothing until a query references them.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
