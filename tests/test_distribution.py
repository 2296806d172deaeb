"""Distribution-layer tests: bucketed join elides shuffles, partition
pruning reaches the scan, salted join preserves semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_spark.operators import distribution as D
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    D.write_bucketed(li, "li_bucketed", ["l_orderkey"], 8)
    D.write_bucketed(od, "od_bucketed", ["o_orderkey"], 8)
    yield "li_bucketed", "od_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS od_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Same-bucketed tables joined on the bucket key: no shuffle on
    either join input — the co-located join Presto needs Hive bucketing
    for.  Broadcast is disabled so the colocation (not a broadcast)
    does the work; at real scale neither side would broadcast anyway.
    """
    li, od = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li)
            .join(spark.table(od), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # exactly one shuffle: the final groupBy on o_custkey (a
        # different key); the join inputs read bucketed files directly.
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_on_bucket_key_no_shuffle(spark, bucketed_tables):
    li, _ = bucketed_tables
    agg = spark.table(li).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert D.explain_has_no_exchange(agg)


def test_partition_pruning_reaches_scan(spark, tmp_path):
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    D.write_partitioned(od, path, ["order_year"])
    scan = (
        spark.read.parquet(path)
        .where(F.col("order_year") == 1997)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(order_year" in scan


def test_salted_join_matches_plain_join(spark):
    left = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    right = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "z")], "k long, label string"
    )
    plain = left.join(right, on=["k"]).groupBy("label").count()
    salted = D.salted_join(left, right, on=["k"]).groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (5, "b")], "k long, v string")
    right = spark.createDataFrame([(1, "m")], "k long, m string")
    out = D.salted_join(left, right, on=["k"], how="left").collect()
    got = {(r.k, r.m) for r in out}
    assert got == {(1, "m"), (5, None)}


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """DPP (Presto dynamic filtering analog, DynamicFilterSourceOperator
    .java): a selective dim filter must prune fact partitions at runtime
    — the fact scan carries a dynamicpruningexpression on the partition
    column."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    fact = orders.withColumn("order_year", F.year("o_orderdate"))
    path = str(tmp_path / "fact_by_year")
    D.write_partitioned(fact, path, ["order_year"])

    years = spark.createDataFrame(
        [(1995, "mid"), (1996, "mid")], "order_year int, era string"
    )
    joined = (
        spark.read.parquet(path)
        .join(F.broadcast(years.where(F.col("era") == "mid")), "order_year")
        .groupBy("era").count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_join(spark):
    """Runtime bloom-filter join (session.py runtime.bloomFilter conf,
    Presto's row-level dynamic filtering): with the size thresholds
    relaxed, a selective build side injects bloom_filter_might_contain
    into the probe-side scan filter."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        # bloom filters are only injected for shuffle joins — a
        # broadcast-able build side would make the filter redundant
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").where(
            F.col("o_totalprice") > 400000
        )
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")) \
                   .groupBy("o_orderpriority").count()
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan, \
            plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
