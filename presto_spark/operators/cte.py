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
