"""Stream-stream joins — event-time interval correlation.

Spark-native extension (Presto has no streaming operators, SURVEY.md
§2.10).  A stream-stream inner join requires watermarks on BOTH sides
plus a time-range predicate so the state store can evict rows that can
no longer match — without the interval bound, both sides' state grows
forever.  This module packages that contract.

Scale shape: the join shuffles both streams on the equality key; state
per key is bounded by (watermark + interval) of events — at 1000
executors the state store partitions with the shuffle, and eviction
keeps each partition's RocksDB/state footprint proportional to the
time bound, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    interval: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join left/right events on ``key`` where the right event
    lands in [left_ts, left_ts + interval].

    Both inputs may be streaming or batch DataFrames — the same
    expression runs in both modes (the batch run is the correctness
    oracle).  Column names must already be disambiguated (no shared
    names besides ``key``).
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
