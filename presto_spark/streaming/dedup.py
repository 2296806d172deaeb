"""Streaming corpus deduplication (round 15).

The ingest-time version of llm/dedup.py exact_dedup: a document
STREAM (a live crawl) drops repeated content as it arrives instead of
in a nightly batch pass.  Spark-first shape: digest each document
JVM-side and let ``dropDuplicatesWithinWatermark`` keep the first
arrival per digest — state is keyed by the 16-byte digest only (text
never enters the state store) and the watermark expires it, so state
size is bounded by the distinct-digest arrival rate times the
watermark horizon, not by corpus size.

Semantics note: within-watermark arrivals of the same digest are
dropped; a duplicate arriving AFTER its predecessor's state expired
passes — the standard streaming-dedup contract (exact global dedup
stays a batch pass, llm/dedup.py).  The digest is md5 to match the
batch tier's oracle-checked digests; switch to xxhash64 in production
for speed (both JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival exact dedup on a document stream: one surviving
    row per content digest within the watermark horizon.  The
    ``digest`` column stays on the output so downstream cross-corpus
    passes (exact_dedup_against) can reuse it without re-hashing."""
    digested = stream_df.withColumn(
        "digest", F.md5(F.col(text_col)))
    return (
        digested.withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )
