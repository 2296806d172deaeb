"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload travels as a
BINARY column (or a reference to object storage) next to a typed
metadata struct; decode/feature-extract runs as Arrow-batched
`mapInPandas` so Python touches whole columnar batches, never rows.

The decode step itself is STUBBED here — the container has no
image/audio libraries — but everything Spark-side is real and tested:
schema, batch iteration, partition sizing, and the UDF signature are
exactly what a PIL/torchaudio-backed implementation would use.  The
deterministic fake feature extractor doubles as the oracle-checkable
path (its features are pure arithmetic of the payload bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: binary payload + metadata struct.

    With real data this column comes straight from parquet; the struct
    carries whatever the upstream writer recorded (mime, dims, sr...).
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("nbytes"),
        ),
    )


FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def decode_image(payload: bytes) -> object:
    """Real decoder slot. Requires PIL/libvips — not in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library; wire PIL.Image.open "
        "here and emit pixel arrays — the Spark plumbing around this "
        "call is complete and tested with the deterministic extractor"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in features: [nbytes, first, last, byte_sum%1e9].

    Pure arithmetic of the bytes → the DuckDB oracle reproduces it, so
    the full mapInPandas pipeline is hash-checked end-to-end.
    """
    return [
        float(len(payload)),
        float(payload[0]) if payload else 0.0,
        float(payload[-1]) if payload else 0.0,
        float(sum(payload) % 1_000_000_007),
    ]


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    mapInPandas: each Arrow batch becomes one pandas DataFrame; the
    loop below is per-batch vectorizable work (a real extractor would
    hand `pdf.payload` to a native decoder in bulk).  Output schema is
    declared, so downstream operators plan against it statically.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "features": pdf["payload"].map(_fake_features),
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize slot. Requires PIL/libvips — not in this container."""
    raise NotImplementedError(
        "image resize requires an imaging library; wire "
        "PIL.Image.resize here — sample_frames/extract_features show "
        "the batch plumbing a real implementation drops into"
    )


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 32,
    stride: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling over a binary payload: every ``stride``-th
    fixed-size frame → one row per sampled frame.

    A video decoder would emit real frames here; the byte-chunk stand-in
    keeps the exact plan shape — map-side chunk + posexplode, no
    shuffle — and is pure arithmetic, so the oracle checks the pipeline
    end-to-end.  Output: (id, frame_no [1-based among sampled], frame,
    n_frames_total).
    """
    n_frames = F.ceil(F.length("payload") / F.lit(frame_bytes)).cast("int")
    starts = F.sequence(F.lit(1), F.greatest(n_frames, F.lit(1)), F.lit(stride))
    frames = F.transform(
        starts,
        lambda i: F.substring(
            F.col("payload"), (i - 1) * frame_bytes + 1, frame_bytes
        ),
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(frames).alias("frame_idx", "frame"),
            n_frames.alias("n_frames_total"),
        )
        .withColumn("frame_no", F.col("frame_idx") + 1)
        .drop("frame_idx")
    )
