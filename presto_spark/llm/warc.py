"""WARC (Web ARChive) ingestion — the entry point of a CommonCrawl-
style corpus pipeline (round 14, built ahead for the r15 driver
window).

ISO 28500 WARC is the format web crawls ship in: a file is a
sequence of records, each a ``WARC/1.0`` header block (``Name:
value`` lines, CRLF-terminated, blank-line-ended) followed by
``Content-Length`` bytes of content block; ``response`` records wrap
a full HTTP response (status line + headers + body).  This module
parses it with the pure stdlib — the same real-decode discipline as
the round-13 image/audio tier — so the full crawl → clean-text chain
(extract_warc → html_to_text → quality/dedup tiers) runs end-to-end
inside one Spark pipeline.

Scale: WARC payloads arrive as a BINARY column (one archive segment
per row — CommonCrawl ships ~1 GB gzip members; upstream splitting
is the reader's concern).  Parsing is mapInPandas: whole Arrow
batches cross into Python once, each record becomes one output row,
and the explode happens map-side — zero shuffle, bounded by the scan
exactly like sample_frames.  Gzip members decompress with
``gzip.decompress`` when the payload carries the magic; everything
downstream is the relational tier.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CRLF = b"\r\n"


def parse_warc(payload: bytes) -> list[dict]:
    """Parse one WARC archive (optionally gzipped) into record dicts:
    ``{"warc_type", "target_uri", "record_id", "content_type",
    "http_status", "http_content_type", "body"}``.  Non-HTTP records
    (warcinfo, request, metadata) keep their raw content block as
    ``body`` with NULL http fields.  Malformed trailing bytes raise —
    a truncated crawl segment should fail loudly, not silently drop
    records."""
    import gzip

    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    records: list[dict] = []
    i, n = 0, len(payload)
    while i < n:
        # skip inter-record blank lines
        while i < n and payload[i:i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        if not payload[i:i + 5] == b"WARC/":
            raise ValueError(
                f"malformed WARC: expected record header at byte {i}")
        head_end = payload.index(_CRLF + _CRLF, i)
        headers: dict[str, str] = {}
        for line in payload[i:head_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        block = payload[head_end + 4:head_end + 4 + clen]
        i = head_end + 4 + clen
        rec = {
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "http_content_type": None,
            "body": block,
        }
        if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
            http_end = block.find(_CRLF + _CRLF)
            if http_end >= 0:
                http_lines = block[:http_end].split(_CRLF)
                status = http_lines[0].decode("utf-8", "replace").split()
                rec["http_status"] = (
                    int(status[1]) if len(status) > 1
                    and status[1].isdigit() else None)
                for line in http_lines[1:]:
                    k, _, v = line.decode(
                        "utf-8", "replace").partition(":")
                    if k.strip().lower() == "content-type":
                        rec["http_content_type"] = v.strip()
                rec["body"] = block[http_end + 4:]
        records.append(rec)
    return records


WARC_SCHEMA = T.StructType([
    T.StructField("segment_id", T.LongType()),
    T.StructField("record_no", T.LongType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("http_status", T.LongType()),
    T.StructField("http_content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
])


def extract_warc(
    df: DataFrame,
    id_col: str = "segment_id",
    payload_col: str = "payload",
) -> DataFrame:
    """One output row per WARC record across all archive segments —
    Arrow-batched mapInPandas, map-side fan-out, zero shuffle."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                for no, rec in enumerate(parse_warc(bytes(payload))):
                    rows.append({
                        "segment_id": sid,
                        "record_no": no,
                        "warc_type": rec["warc_type"],
                        "target_uri": rec["target_uri"],
                        "record_id": rec["record_id"],
                        "http_status": rec["http_status"],
                        "http_content_type": rec["http_content_type"],
                        "body": rec["body"],
                        "n_bytes": len(rec["body"]),
                    })
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return df.mapInPandas(run, schema=WARC_SCHEMA)


def synth_warc(segment_id: int, n_responses: int = 3,
               gzipped: bool = False) -> bytes:
    """Deterministic synthetic WARC segment: a warcinfo record plus
    ``n_responses`` HTTP response records whose HTML bodies are pure
    arithmetic of (segment_id, record index) — the multimodal
    synth_pgm contract, so a SQL oracle can replay every extracted
    field."""
    import gzip

    def record(warc_type: str, extra: dict, block: bytes) -> bytes:
        head = [f"WARC/1.0", f"WARC-Type: {warc_type}"]
        head += [f"{k}: {v}" for k, v in extra.items()]
        head.append(f"Content-Length: {len(block)}")
        return ("\r\n".join(head) + "\r\n\r\n").encode() + block + _CRLF * 2

    out = record(
        "warcinfo",
        {"WARC-Record-ID": f"<urn:uuid:seg-{segment_id}>",
         "Content-Type": "application/warc-fields"},
        f"software: synth/{segment_id}\r\n".encode())
    for j in range(n_responses):
        html = (f"<html><body><h1>Doc {segment_id}-{j}</h1>"
                f"<p>word{(segment_id * 31 + j) % 97} "
                f"word{(segment_id * 17 + 3 * j) % 89}</p>"
                f"</body></html>").encode()
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html)
        out += record(
            "response",
            {"WARC-Record-ID": f"<urn:uuid:seg-{segment_id}-{j}>",
             "WARC-Target-URI":
                 f"https://example.com/{segment_id}/{j}",
             "Content-Type": "application/http; msgtype=response"},
            http)
    return gzip.compress(out) if gzipped else out
