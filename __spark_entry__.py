"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``presto_spark/queries/`` — this module only
adapts the registry to the driver's contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from presto_spark.queries import REGISTRY  # noqa: E402


def _configure(spark: SparkSession, sf_dir: str | None = None) -> SparkSession:
    """Apply engine session settings to a driver-provided session.

    Mirrors every runtime-settable *semantic* conf that the engine's own
    ``presto_spark.session.get_spark`` pins at build time, so a driver
    session executes under the same cast/overflow/NULL semantics the
    engine was validated under.  Spark 4 defaults ANSI mode ON, which
    turns element_at/cast overflows into throws — Presto semantics (and
    this engine) are non-ANSI (session.py rationale block).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Arrow batch sizing (session.py rationale): batch-local partial
    # operators (quantile coresets, partial hulls) compose exactly under
    # ANY batching, but mirroring the engine's batch size keeps a driver
    # session's sketch envelopes on the exact values the engine was
    # validated with.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
    spark.conf.set(
        "spark.sql.execution.arrow.maxBytesPerBatch", str(64 * 1024 * 1024))
    if sf_dir is not None:
        from presto_spark.session import tune_for_input

        tune_for_input(spark, sf_dir)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    _configure(spark)
    return REGISTRY["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in REGISTRY.items():
        def make(qq):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _configure(spark, sf_dir)
                return qq.spark(spark, sf_dir)
            return run
        out[name] = make(q)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
