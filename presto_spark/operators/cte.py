"""Multi-reference CTE materialization policy.

Presto materializes CTEs referenced more than once
(reference: presto-main-base/.../sql/planner/optimizations/
LogicalCteOptimizer.java, PhysicalCteOptimizer.java).  Catalyst inlines
CTEs, so a WITH-clause subtree referenced N times is scanned and
computed N times.  The engine-level policy: callers mark expensive
shared subtrees with ``materialize`` and we persist them
(MEMORY_AND_DISK — spills instead of OOM at scale), which is exactly
the checkpoint a 1000-executor job wants for a reused multi-TB
intermediate.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def materialize(df: DataFrame) -> DataFrame:
    """Persist a shared subtree (multi-reference CTE analog)."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


@contextmanager
def materialized(df: DataFrame):
    """Scoped version: persist for the duration, then release.

    Use when the shared subtree is consumed fully inside one job burst::

        with materialized(shingles) as sh:
            result = build(sh).collect()
    """
    df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        yield df
    finally:
        df.unpersist()


def checkpoint_tracked(df: DataFrame) -> tuple[DataFrame, list[int]]:
    """Eager localCheckpoint that reports which RDD block-sets it pinned.

    ``DataFrame.unpersist()`` cannot release local-checkpoint blocks (it
    only drops CacheManager plan entries), so iterative operators that
    checkpoint per round leak executor memory for the session lifetime
    unless the superseded RDDs are unpersisted explicitly.  We diff the
    SparkContext's persistent-RDD registry around the checkpoint and
    hand the new ids back; release them with :func:`release_checkpoints`
    once the next round's checkpoint supersedes this one.
    """
    jsc = df.sparkSession.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keys())
    out = df.localCheckpoint(eager=True)
    new_ids = [i for i in jsc.getPersistentRDDs().keys() if i not in before]
    return out, new_ids


def release_checkpoints(spark, rdd_ids: list[int]) -> None:
    """Unpersist local-checkpoint blocks recorded by checkpoint_tracked."""
    live = spark.sparkContext._jsc.getPersistentRDDs()
    for i in rdd_ids:
        if i in live:
            live[i].unpersist()
