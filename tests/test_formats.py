"""Source/sink format round-trips — the engine's "connector" surface.

Presto reaches formats through connector modules (presto-orc/,
presto-parquet/, presto-rcfile/, csv/json via hive serdes); Spark's
built-in datasources cover the same set. Each round-trip asserts
schema + value fidelity through write → read.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sample(spark):
    return spark.read.parquet("/root/testdata/sf0.001/nation.parquet")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, sample, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp(f"fmt_{fmt}") / "t")
    w = sample.write.mode("overwrite").format(fmt)
    r = spark.read.format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
        r = r.option("header", "true").schema(sample.schema)
    if fmt == "json":
        # JSON is schemaless: inference alphabetizes columns, so reads
        # supply the schema (same as any production JSON ingest).
        r = r.schema(sample.schema)
    w.save(path)
    back = r.load(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))
    if fmt in ("parquet", "orc"):  # self-describing formats keep schema
        assert back.schema == sample.schema


def test_orc_predicate_pushdown(spark, sample, tmp_path):
    """ORC scans push filters like parquet (presto-orc/ reader parity)."""
    path = str(tmp_path / "orc_t")
    sample.write.mode("overwrite").orc(path)
    plan = (
        spark.read.orc(path)
        .where(F.col("n_nationkey") > 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(n_nationkey), GreaterThan(n_nationkey,10)]" in plan


def test_jdbc_datasource_registered(spark):
    """The JDBC datasource class resolves (presto-base-jdbc/ family
    analog) — no live database in this container, so resolution of the
    format is the testable surface."""
    from py4j.protocol import Py4JJavaError

    try:
        spark.read.format("jdbc").option("url", "jdbc:invalid://x").option(
            "dbtable", "t"
        ).load()
        raise AssertionError("expected failure without a driver")
    except (Py4JJavaError, Exception) as e:  # noqa: BLE001
        msg = str(e)
        # Failing on driver/connection (not on unknown format) proves
        # the datasource is present and parsed the options.
        assert "ClassNotFoundException: jdbc" not in msg
