"""Long-session soak: the heaviest registry queries run twice in ONE
session and must leave no persisted/checkpointed state behind, and must
not get slower on the second pass.

Locks in the round-3 lifecycle fix (near_dedup_pairs/dedup_clusters
releasing their persist/localCheckpoint blocks — llm/dedup.py,
operators/cte.py checkpoint_tracked/release_checkpoints): a regression
that leaks corpus-sized cached blocks would show up here as retained
RDDs and a slower pass 2, the exact failure mode that poisoned the r2
bench session.
"""

from __future__ import annotations

import time

from presto_spark.queries import REGISTRY
from tests.conftest import SF_DIR

# The heaviest bench-tagged queries by BENCH_r03 wall time — the set
# whose lifecycle behavior matters in a long-lived session (iterative
# checkpointing, LSH persist/release, applyInPandas sketch tiers,
# recursive CTEs, big self-joins).
_HEAVY = [
    "llm_dedup_clusters",
    "llm_lsh_near_dedup",
    "analytics_market_basket",
    "analytics_yoy_growth",
    "sketch_quantile_mergeable_rollup",
    "recursive_date_spine",
    "recursive_tree_rollup",
    "llm_vocabulary",
    "llm_chunk_documents",
    "event_tumbling_window",
]


def _run_pass(spark) -> float:
    t0 = time.time()
    for name in _HEAVY:
        REGISTRY[name].spark(spark, SF_DIR).collect()
    return time.time() - t0


def _drain_persistent(spark, timeout: float = 30.0) -> dict:
    """Persistent RDDs remaining once the ContextCleaner has had a
    chance to run.  The final checkpoint of an iterative operator is
    reclaimed by the cleaner after the caller drops the result (by
    design — dedup.py dedup_clusters docstring); a real leak (strongly
    referenced block, the r2 failure mode) never drains."""
    import gc

    deadline = time.time() + timeout
    while time.time() < deadline:
        gc.collect()
        spark._jvm.System.gc()
        live = dict(spark.sparkContext._jsc.getPersistentRDDs())
        if not live:
            return {}
        time.sleep(0.5)
    return live


def test_soak_no_leaks_and_steady_timing(spark):
    for name in _HEAVY:
        assert name in REGISTRY, name
    # Pass 1 warms codegen/JIT/footers; pass 2 is the steady-state probe.
    t1 = _run_pass(spark)
    leaked = _drain_persistent(spark)
    assert not leaked, f"persistent RDDs retained after pass 1: {leaked}"
    assert len(spark.catalog.listTables()) >= 0  # session still healthy
    t2 = _run_pass(spark)
    leaked = _drain_persistent(spark)
    assert not leaked, f"persistent RDDs retained after pass 2: {leaked}"
    # Steady-state bound: pass 2 must not degrade. 1.3x + 3s absorbs
    # scheduler jitter on sub-second queries at test SF while still
    # catching a leak-driven slowdown (r2's was >5x).
    assert t2 <= 1.3 * t1 + 3.0, f"pass2 {t2:.1f}s vs pass1 {t1:.1f}s"
