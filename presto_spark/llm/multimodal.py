"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload travels as a
BINARY column (or a reference to object storage) next to a typed
metadata struct; decode/feature-extract runs as Arrow-batched
`mapInPandas` so Python touches whole columnar batches, never rows.

Decode status (round 13): formats decodable with the PURE STDLIB
decode for real — NetPBM PGM/PPM and uncompressed 24-bit BMP images
(decode_image), PCM WAV audio (decode_audio), plus a real
nearest-neighbor resize_image — so the decode → transform → feature
pipeline runs end-to-end, oracle-checked via deterministic synthetic
payloads (synth_pgm/synth_wav).  Only codec-requiring formats
(JPEG/PNG/compressed audio) remain NotImplementedError slots where
PIL/torchaudio wire in; everything Spark-side — schema, batch
iteration, partition sizing, UDF signatures — is identical for both
paths.  The legacy fake-feature extractor stays as the
format-agnostic byte-arithmetic tier.
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


def decode_image(payload: bytes) -> dict:
    """Decode an image payload with pure stdlib — REAL decoders for
    the container-decodable formats (round 13; previously a blanket
    stub):

    * **PGM (P5)** / **PPM (P6)** — NetPBM binary: whitespace-token
      header (magic, width, height, maxval; ``#`` comments skipped),
      then raw samples, 1 or 3 channels.
    * **BMP** — Windows bitmap, uncompressed 24-bit BI_RGB only:
      little-endian header fields, bottom-up rows padded to 4 bytes,
      BGR → RGB.

    Returns ``{"width", "height", "channels", "pixels"}`` with pixels
    row-major, channel-interleaved ints.  Formats that need a native
    codec (JPEG/PNG/WebP/...) still raise NotImplementedError — that
    slot is where PIL/libvips wires in.
    """
    import struct

    if payload[:2] in (b"P5", b"P6"):
        channels = 1 if payload[:2] == b"P5" else 3
        # header tokenizer: 4 whitespace-separated tokens, # comments
        # run to end-of-line
        tokens, i, n = [], 2, len(payload)
        while len(tokens) < 3 and i < n:
            c = payload[i:i + 1]
            if c == b"#":
                while i < n and payload[i:i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < n and not payload[j:j + 1].isspace():
                    j += 1
                tokens.append(int(payload[i:j]))
                i = j
        i += 1  # single whitespace byte after maxval
        width, height, maxval = tokens
        if maxval > 255:
            raise NotImplementedError("16-bit NetPBM samples")
        raw = payload[i:i + width * height * channels]
        return {"width": width, "height": height, "channels": channels,
                "pixels": list(raw)}
    if payload[:2] == b"BM":
        width = struct.unpack_from("<i", payload, 18)[0]
        height = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"only uncompressed 24-bit BMP decodes here "
                f"(bpp={bpp}, compression={compression})")
        if height <= 0 or width <= 0:
            # negative height = top-down row order (rare writer
            # variant) — not wired; zero/negative width is malformed
            raise NotImplementedError(
                f"bottom-up positive-dimension BMP only "
                f"(width={width}, height={height})")
        offset = struct.unpack_from("<I", payload, 10)[0]
        row_bytes = (width * 3 + 3) & ~3
        pixels: list[int] = []
        for y in range(height):           # stored bottom-up
            row = offset + (height - 1 - y) * row_bytes
            for x in range(width):
                b, g, r = payload[row + 3 * x:row + 3 * x + 3]
                pixels += [r, g, b]
        return {"width": width, "height": height, "channels": 3,
                "pixels": pixels}
    raise NotImplementedError(
        "this format needs a native codec (JPEG/PNG/...); wire "
        "PIL.Image.open here — PGM/PPM/BMP decode with pure stdlib "
        "above, and the Spark plumbing is identical for both paths"
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


def resample_pixels(img: dict, width: int, height: int) -> list[int]:
    """Nearest-neighbor resample of a decoded image dict: target pixel
    ``(x, y)`` reads src pixel ``(floor(x*W/width), floor(y*H/height))``.
    Pure pixel-list arithmetic — the decode→resample→encode split
    (ADVICE r13) lets feature extractors share one decode instead of
    round-tripping through bytes per transform."""
    if width <= 0 or height <= 0:
        raise ValueError(
            f"resize dimensions must be positive: {width}x{height}")
    w, h, c = img["width"], img["height"], img["channels"]
    px = img["pixels"]
    out: list[int] = []
    for y in range(height):
        sy = y * h // height
        for x in range(width):
            sx = x * w // width
            base = (sy * w + sx) * c
            out += px[base:base + c]
    return out


def encode_netpbm(pixels: list[int], width: int, height: int,
                  channels: int) -> bytes:
    """Encode a pixel list as binary NetPBM (P5 for 1 channel, P6
    for 3) — the inverse of decode_image's NetPBM arm."""
    if channels not in (1, 3):
        raise ValueError(f"NetPBM encodes 1 or 3 channels: {channels}")
    magic = b"P5" if channels == 1 else b"P6"
    return magic + f" {width} {height} 255\n".encode() + bytes(pixels)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize — REAL for the stdlib-decodable formats
    (round 13): decode via :func:`decode_image`, resample via
    :func:`resample_pixels`, re-encode via :func:`encode_netpbm`.
    Same contract a PIL-backed implementation would honor; per-image
    work is bounded by the target size.  Formats decode_image cannot
    parse propagate its NotImplementedError."""
    img = decode_image(payload)
    return encode_netpbm(
        resample_pixels(img, width, height), width, height,
        img["channels"])


def decode_audio(payload: bytes) -> dict:
    """Decode a WAV payload with the stdlib ``wave`` module — REAL
    audio decode (round 13): returns ``{"n_channels", "framerate",
    "n_frames", "sample_width", "samples"}`` with samples as ints
    (8-bit unsigned or 16-bit signed PCM, channel-interleaved) and
    ``sample_width`` in bytes so feature extractors can pick the
    matching center convention (ADVICE r13: 8-bit PCM centers on 128,
    16-bit on 0).  Non-WAV payloads raise NotImplementedError (the
    torchaudio/ffmpeg slot)."""
    import io
    import struct
    import wave

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only PCM WAV decodes with the stdlib; wire "
            "torchaudio/ffmpeg here for compressed audio")
    with wave.open(io.BytesIO(payload)) as w:
        n_channels = w.getnchannels()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n_frames)
    if width == 1:
        samples = list(raw)
    elif width == 2:
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM")
    return {"n_channels": n_channels, "framerate": framerate,
            "n_frames": n_frames, "sample_width": width,
            "samples": samples}


def synth_pgm(doc_id: int, width: int = 8, height: int = 6) -> bytes:
    """Deterministic PGM test image: pixel k = (doc_id*31 + k) % 256.
    Pure arithmetic so a SQL oracle can replay every decoded feature
    (the multimodal analog of the fake-feature contract)."""
    body = bytes((doc_id * 31 + k) % 256 for k in range(width * height))
    return b"P5 " + f"{width} {height} 255\n".encode() + body


def synth_wav(doc_id: int, n_frames: int = 64, framerate: int = 8000) -> bytes:
    """Deterministic 8-bit mono PCM WAV: sample k = (doc_id*17+3k)%256."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(framerate)
        w.writeframes(bytes((doc_id * 17 + 3 * k) % 256
                            for k in range(n_frames)))
    return buf.getvalue()


def synth_wav16(doc_id: int, n_frames: int = 64,
                framerate: int = 8000) -> bytes:
    """Deterministic 16-bit signed mono PCM WAV: sample k =
    (doc_id*29 + 5k) % 4096 - 2048 — exercises the signed/centered-
    on-0 feature path (ADVICE r13)."""
    import io
    import struct
    import wave

    samples = [(doc_id * 29 + 5 * k) % 4096 - 2048
               for k in range(n_frames)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{n_frames}h", *samples))
    return buf.getvalue()


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("channels", T.LongType()),
    T.StructField("mean_pixel", T.DoubleType()),
    T.StructField("min_pixel", T.LongType()),
    T.StructField("max_pixel", T.LongType()),
    T.StructField("resized_mean", T.DoubleType()),
])


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    resize_to: tuple[int, int] = (4, 3),
) -> DataFrame:
    """Arrow-batched REAL image pipeline (round 13): decode each
    payload (PGM/PPM/BMP — pure stdlib), compute pixel statistics, and
    re-sample through the nearest-neighbor resize — the full
    decode → transform → feature shape a PIL-backed pipeline uses,
    with the decode actually running.  mapInPandas: whole Arrow
    batches cross into Python once; per-image work is bounded by the
    pixel count.  Each payload decodes exactly ONCE — stats and the
    resample share the pixel buffer (ADVICE r13: the round-13 version
    re-decoded through resize_image's byte round-trip, ~2x per-image
    CPU).  Zero shuffle."""
    rw, rh = resize_to

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload))
                px = img["pixels"]
                resized = resample_pixels(img, rw, rh)
                rows.append({
                    "doc_id": did,
                    "width": img["width"],
                    "height": img["height"],
                    "channels": img["channels"],
                    # unrounded: Python round() is half-even while
                    # Spark/DuckDB round half-up — callers round in
                    # the query layer so oracles agree
                    "mean_pixel": sum(px) / len(px),
                    "min_pixel": min(px),
                    "max_pixel": max(px),
                    "resized_mean": sum(resized) / len(resized),
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_channels", T.LongType()),
    T.StructField("framerate", T.LongType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("sample_width", T.LongType()),
    T.StructField("duration_sec", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.LongType()),
])


def audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched REAL audio pipeline (round 13): stdlib WAV decode
    then duration, RMS, and zero-crossing count — all pure arithmetic
    of the PCM samples, so a SQL oracle replays them exactly.  The
    center convention follows the decoded sample width (ADVICE r13:
    the round-13 version hardwired the 8-bit convention, silently
    mis-measuring 16-bit WAVs): 8-bit unsigned PCM centers on 128 and
    zero-crosses at the >= 128 boundary; 16-bit signed PCM centers on
    0 and zero-crosses at >= 0.  Zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                a = decode_audio(bytes(payload))
                s = a["samples"]
                center = 128 if a["sample_width"] == 1 else 0
                centered = [v - center for v in s]
                rms = (sum(v * v for v in centered) / len(s)) ** 0.5
                zc = sum(
                    1 for i in range(len(s) - 1)
                    if (s[i] >= center) != (s[i + 1] >= center))
                rows.append({
                    "doc_id": did,
                    "n_channels": a["n_channels"],
                    "framerate": a["framerate"],
                    "n_frames": a["n_frames"],
                    "sample_width": a["sample_width"],
                    "duration_sec": a["n_frames"] / a["framerate"],
                    "rms": rms,
                    "zero_crossings": zc,
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


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


# ---- perceptual-hash image near-dup (round 15, built ahead for r16) ----

AHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("band0", T.LongType()),
    T.StructField("band1", T.LongType()),
    T.StructField("band2", T.LongType()),
    T.StructField("band3", T.LongType()),
])


def ahash_bands(img: dict) -> list[int]:
    """64-bit average hash of a decoded image, as four 16-bit bands.

    The classic aHash recipe (public): downsample to 8x8, threshold
    each cell against the global mean.  Two engine-specific choices
    keep it exactly replayable in SQL:

    * the grayscale cell value is the INTEGER channel sum (no /c), and
      the threshold compares 64 * cell > total (strict) — integer
      cross-multiplication instead of a float mean, so no rounding
      anywhere;
    * the hash ships as four 16-bit band ints (cells 16j..16j+15,
      bit (k - 16j) set when cell k is bright).  Bands fit BIGINT
      without touching the sign bit AND double as the banding keys:
      by pigeonhole, two hashes within Hamming distance 3 agree on at
      least one band, so band-equality joins are a complete candidate
      generator for max_hamming <= 3 — the MinHash-LSH shape on the
      image tier.
    """
    cells = resample_pixels(img, 8, 8)
    c = img["channels"]
    sums = [sum(cells[i * c:(i + 1) * c]) for i in range(64)]
    total = sum(sums)
    bands = []
    for j in range(4):
        b = 0
        for i in range(16):
            if 64 * sums[j * 16 + i] > total:
                b |= 1 << i
        bands.append(b)
    return bands


def image_ahash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, band0..band3) — Arrow-batched real-decode aHash; one
    decode per payload, zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = ahash_bands(decode_image(bytes(payload)))
                rows.append({
                    "doc_id": did, "band0": b[0], "band1": b[1],
                    "band2": b[2], "band3": b[3],
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in AHASH_SCHEMA.fields])

    return df.mapInPandas(run, schema=AHASH_SCHEMA)


def image_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image near-duplicate pairs (id_a < id_b, hamming) by perceptual
    hash: aHash bands -> candidates from a band-equality self-join
    (complete for max_hamming <= 3 by pigeonhole; above that it is the
    standard recall/cost LSH trade, documented rather than silent) ->
    exact 64-bit Hamming verify via bit_count(xor) over the four
    bands.  Only (id, 4 x 16-bit ints) ride the shuffle — payloads
    never leave the scan stage.

    Skew note (the LSH family's standard caveat): boilerplate images
    — solid fills, blank scans — collapse onto a few hot band keys
    and make those buckets quadratic, exactly like hot shingles in
    the text tier.  AQE skew-join splits the hot buckets at runtime;
    for corpora dominated by such images, pre-filter trivial hashes
    (all-zero/all-one bands) or cap bucket size upstream, the
    max_shingle_bench_df recipe."""
    sig = image_ahash(df, id_col, payload_col)
    banded = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("band"),
                     F.col(f"band{j}").alias("key"))
            for j in range(4)
        ])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.key")
    cands = (
        banded.alias("l")
        .join(banded.alias("r"),
              on=[F.col("l.band") == F.col("r.band"),
                  F.col("l.key") == F.col("r.key"),
                  F.col("l.doc_id") < F.col("r.doc_id")])
        .select(F.col("l.doc_id").alias("id_a"),
                F.col("r.doc_id").alias("id_b"))
        .distinct()
    )
    a = sig.alias("sa")
    b = sig.alias("sb")
    ham = sum(
        F.bit_count(
            F.col(f"sa.band{j}").bitwiseXOR(F.col(f"sb.band{j}")))
        for j in range(4)
    )
    return (
        cands.join(a, cands.id_a == F.col("sa.doc_id"))
        .join(b, cands.id_b == F.col("sb.doc_id"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def synth_pgm_pair(doc_id: int, width: int = 8, height: int = 6) -> bytes:
    """Deterministic near-duplicate PGM family: doc pairs (2m, 2m+1)
    share base image m (pixel k = (m*31 + k) % 256) and the odd member
    bumps pixel 0 by 9 — a one-cell perturbation, so perceptual-hash
    pairs exist by construction and a SQL oracle replays every pixel
    (the synth_pgm contract extended to near-dup structure)."""
    base = doc_id // 2
    bump = 9 if doc_id % 2 else 0
    body = bytes(
        ((base * 31 + k + (bump if k == 0 else 0)) % 256)
        for k in range(width * height))
    return b"P5 " + f"{width} {height} 255\n".encode() + body


# ---- energy-contour audio fingerprint (round 15, built ahead) ----

AUDIO_FP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("fingerprint", T.LongType()),
    T.StructField("n_samples", T.LongType()),
])


def audio_fingerprint_bits(audio: dict, n_windows: int = 32) -> int:
    """31-bit energy-contour fingerprint of a decoded audio dict.

    Recipe (the shape under Shazam-class audio matchers, reduced to
    its replayable core): center samples by the width convention
    (8-bit PCM on 128, 16-bit on 0 — the ADVICE-r13 contract), slice
    the interleaved stream into ``n_windows`` windows of
    q = max(1, n // n_windows) samples (the tail folds into the last
    window), energy_w = integer sum of squared deviations, and bit w
    is set iff energy_w > energy_{w+1} (strict).  All integers — no
    float anywhere — so a SQL oracle replays it exactly, and
    amplitude scaling multiplies every energy by the same factor, so
    the sign contour (hence the fingerprint) is volume-invariant:
    the same clip at half volume fingerprints identically and exact
    fingerprint equality is the audio near-dup join key."""
    center = 128 if audio["sample_width"] == 1 else 0
    s = audio["samples"]
    n = len(s)
    if n == 0:
        return 0
    q = max(1, n // n_windows)
    energy = [0] * n_windows
    for i, v in enumerate(s):
        w = min(i // q, n_windows - 1)
        d = v - center
        energy[w] += d * d
    fp = 0
    for w in range(n_windows - 1):
        if energy[w] > energy[w + 1]:
            fp |= 1 << w
    return fp


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, fingerprint, n_samples) — Arrow-batched real WAV decode +
    the integer energy-contour fingerprint; zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                audio = decode_audio(bytes(payload))
                rows.append({
                    "doc_id": did,
                    "fingerprint": audio_fingerprint_bits(audio),
                    "n_samples": len(audio["samples"]),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FP_SCHEMA.fields])

    return df.mapInPandas(run, schema=AUDIO_FP_SCHEMA)


def audio_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Audio near-duplicate pairs (id_a < id_b, fingerprint) by exact
    fingerprint equality — volume-invariant by construction.  Only
    (id, fingerprint) ride the shuffle; the equality join is the
    digest-dedup shape (uniform keys, no all-pairs).  Silence and
    constant tones collapse onto fingerprint 0 — the hot-key caveat
    of every digest tier; pre-filter or AQE skew-join as usual."""
    sig = audio_fingerprint(df, id_col, payload_col)
    a = sig.select(F.col("doc_id").alias("id_a"),
                   F.col("fingerprint"))
    b = sig.select(F.col("doc_id").alias("id_b"),
                   F.col("fingerprint"))
    return (
        a.join(b, ["fingerprint"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fingerprint")
    )


def synth_wav16_pair(doc_id: int, n_frames: int = 256,
                     framerate: int = 8000) -> bytes:
    """Deterministic near-duplicate WAV family: doc pairs (2m, 2m+1)
    share base clip m (sample k = ((m*37 + 5k) % 200 - 100) * 100,
    16-bit signed) and the odd member plays it at EXACTLY half volume
    (samples * 50 instead of * 100 — exact, no rounding), so
    fingerprint-equality pairs exist by construction and a SQL oracle
    replays every sample."""
    import io
    import struct
    import wave

    base = doc_id // 2
    scale = 50 if doc_id % 2 else 100
    samples = [((base * 37 + 5 * k) % 200 - 100) * scale
               for k in range(n_frames)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{n_frames}h", *samples))
    return buf.getvalue()
