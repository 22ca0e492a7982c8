"""WARC (Web ARChive, ISO 28500 / WARC-1.0) source — the Common-Crawl
entry point of web-scale pretraining pipelines (C4, RefinedWeb, Dolma all
begin at WARC response records).

Record framing is length-delimited, not line-delimited::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Date: 2026-01-01T00:00:00Z\r\n
    WARC-Target-URI: http://example.com/\r\n
    Content-Length: N\r\n
    \r\n
    <N payload bytes>\r\n\r\n

so a WARC file cannot be split mid-stream by a text source. The scalable
read is FILE-granular: ``spark.read.format("binaryFile")`` yields one row
per file and the record parser runs as an Arrow ``mapInPandas`` stage —
the same decode-at-the-edge pattern as the multimodal decoders
(`operators/multimodal.py`). Parallelism comes from file count, which is
how the format is distributed in practice (Common Crawl ships ~64k
segment files of ~1 GB per crawl — ample task fan-out at 100 TB, and one
file fits executor memory by construction). Gzipped inputs (`.warc.gz`,
member-per-record as crawlers emit them) are handled by multi-member
gzip decompression.

Corrupt-record routing mirrors the engine's Firehose-analog contract
(`parquet_lake.split_corrupt_json`): a malformed record (bad version
line, unparseable headers, truncated payload) becomes an error row
carrying (file, offset, reason) — never a poisoned batch, never a silent
drop. For HTTP response records the payload splits into status /
headers / body; body text is decoded utf-8-with-replacement, the
universal-ingest choice (charset sniffing beyond the header is a
downstream quality-filter concern, cf. `operators/curation.c4_clean`).

Only slim parsed columns leave the stage unless ``keep_payload`` is set —
column pruning keeps raw bytes out of any downstream shuffle.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Unified parse output; `error IS NULL` partitions good from corrupt.
_PARSED_SCHEMA = (
    "warc_file string, record_offset long, record_id string, warc_type string, "
    "url string, warc_date string, mime string, http_status int, "
    "content_type string, n_bytes long, text string, payload binary, "
    "error string"
)

WARC_VERSIONS = (b"WARC/1.0", b"WARC/1.1")


def _split_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP response payload; the
    whole payload is the body when it isn't HTTP-framed."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None, payload
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    content_type = None
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            content_type = v.strip().decode("ascii", "replace")
            break
    return status, content_type, body


def parse_warc_records(data: bytes, source_name: str) -> Iterator[dict]:
    """Yield one dict per WARC record (error records carry ``error``).

    Pure-Python record walker over one file's bytes — runs executor-side
    inside the Arrow stage, never on the driver.
    """
    if source_name.endswith(".gz") or data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)  # handles multi-member streams
        except OSError as exc:
            yield {"warc_file": source_name, "record_offset": 0,
                   "error": f"gzip: {exc}"}
            return
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        offset = pos
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            yield {"warc_file": source_name, "record_offset": offset,
                   "error": "truncated header block"}
            return
        head = data[pos:head_end]
        lines = head.split(b"\r\n")
        if lines[0].rstrip() not in WARC_VERSIONS:
            yield {"warc_file": source_name, "record_offset": offset,
                   "error": f"bad version line: {lines[0][:40]!r}"}
            # resync: look for the next version marker
            nxt = min(
                (p for v in WARC_VERSIONS if (p := data.find(v, pos + 1)) >= 0),
                default=-1,
            )
            if nxt < 0:
                return
            pos = nxt
            continue
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            yield {"warc_file": source_name, "record_offset": offset,
                   "error": "missing/invalid Content-Length"}
            pos = head_end + 4
            continue
        body_start = head_end + 4
        if body_start + length > n:
            yield {"warc_file": source_name, "record_offset": offset,
                   "error": f"truncated payload: need {length} bytes, "
                            f"have {n - body_start}"}
            return
        payload = data[body_start:body_start + length]
        status, content_type, body = _split_http_payload(payload)
        yield {
            "warc_file": source_name,
            "record_offset": offset,
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "mime": headers.get("content-type"),
            "http_status": status,
            "content_type": content_type,
            "n_bytes": len(body),
            "text": body.decode("utf-8", "replace"),
            "payload": payload,
            "error": None,
        }
        pos = body_start + length


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] = ("response",),
    keep_payload: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read WARC file(s) into (records, corrupt).

    ``records``: one row per WARC record of the requested types, with the
    HTTP payload split into (http_status, content_type, n_bytes, text) —
    the (url, ts, mime, payload) surface that feeds `extract_domains` /
    `c4_clean` / `curate_corpus`. ``corrupt``: (warc_file, record_offset,
    error) rows for malformed framing. The raw ``payload`` column is
    dropped unless ``keep_payload`` (keep parsed-text-only columns out of
    downstream shuffles).
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _parse_and_split(files, record_types, keep_payload)


def _parse_mapper():
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "warc_file", "record_offset", "record_id", "warc_type", "url",
            "warc_date", "mime", "http_status", "content_type", "n_bytes",
            "text", "payload", "error",
        ]
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(content), str(fname)):
                    rows.append([rec.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return parse


def _parse_and_split(
    files: DataFrame, record_types: tuple[str, ...], keep_payload: bool
) -> tuple[DataFrame, DataFrame]:
    parsed = files.mapInPandas(_parse_mapper(), schema=_PARSED_SCHEMA)
    good = parsed.filter(F.col("error").isNull()).drop("error")
    if record_types:
        good = good.filter(F.col("warc_type").isin(*record_types))
    if not keep_payload:
        good = good.drop("payload")
    bad = parsed.filter(F.col("error").isNotNull()).select(
        "warc_file", "record_offset", "error"
    )
    return good, bad


def read_warc_stream(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] = ("response",),
    keep_payload: bool = False,
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of :func:`read_warc`: watch a crawl-drop directory
    and parse WARC shards as they land (the continuous-crawl ingest mode —
    a fetcher fleet appends shards, this stream turns them into the same
    (url, ts, mime, text) surface incrementally, exactly-once per file via
    the file-source checkpoint).

    Same record parser, same corrupt routing, stateless ``mapInPandas`` —
    so every batch guarantee read_warc's tests pin carries over
    per-micro-batch. ``maxFilesPerTrigger`` is the backpressure bound.
    Both returned DataFrames are streaming; route them with foreachBatch
    (two sinks) or writeStream directly."""
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    return _parse_and_split(files, record_types, keep_payload)


def warc_bytes(records: list[dict]) -> bytes:
    """Serialize records to valid WARC/1.0 bytes (round-trip fixture
    builder and the write-side of the source). Each record dict:
    {url, date, body (bytes|str), status?, content_type?, record_id?}."""
    out = io.BytesIO()
    for i, rec in enumerate(records):
        body = rec["body"]
        if isinstance(body, str):
            body = body.encode("utf-8")
        http = (
            f"HTTP/1.1 {rec.get('status', 200)} OK\r\n"
            f"Content-Type: {rec.get('content_type', 'text/plain; charset=utf-8')}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii") + body
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: {rec.get('record_id', f'<urn:uuid:rec-{i}>')}\r\n"
            f"WARC-Date: {rec['date']}\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("ascii")
        out.write(head + http + b"\r\n\r\n")
    return out.getvalue()
