"""Data-distribution operators: bucketing, partitioned layout, skew salting.

Presto leans on connector-provided distribution: Hive bucketed tables
let its planner skip repartitioning
(reference: presto-hive/.../HiveBucketing.java area; plan-level
`hash_partition_count` SystemSessionProperties.java:109), and skewed
keys are the classic MPP join pathology.  On Spark the equivalents are
first-class and this module packages the policies:

* ``write_bucketed`` / ``write_partitioned`` — table layouts that make
  repeated joins/aggs on the bucket keys shuffle-free and make
  time-range scans prune files.  At 100 TB bucketing the fact table on
  its join key once saves a multi-TB shuffle on *every* subsequent join.
* ``salted_join`` — explicit skew mitigation for the long tail AQE's
  skew-split can't fix (a single key bigger than an executor): the
  skewed side gets a random salt in [0, n), the build side is exploded
  n-fold, and the join key becomes (key, salt).  Correctness is
  unchanged; the hot key's rows spread over n tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, name: str, bucket_cols: list[str], n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed managed table (hash-bucketed files).

    Joins/aggregations between tables bucketed the same way on the same
    keys skip the shuffle entirely (asserted in tests/test_distribution.py
    — the plan has zero Exchange nodes).  ``sort_cols`` additionally
    sorts within buckets, turning merge joins scan-ready.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned directory layout → partition pruning.

    Filters on the partition columns prune entire directories before
    any IO (PartitionFilters in the scan node) — Presto gets this from
    Hive metastore partitions (PickTableLayout.java:77 pushdown)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side,
    explode the (smaller) right side n_salts-fold.

    Use when one key's row count exceeds what a single task should hold
    — beyond what AQE skew-split handles (it splits partitions, not
    single-key hot spots on the build side).  The join result is
    identical to ``left.join(right, on, how)``.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_exploded = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_salted.join(r_exploded, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def explain_has_no_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains no shuffle Exchange — the
    bucketed-join success criterion."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
