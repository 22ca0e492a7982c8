"""EXIF metadata: APP1/TIFF-IFD parsing for JPEG payloads, pure stdlib.

A multimodal lake's images carry their provenance in EXIF (capture time,
camera, orientation, true pixel dimensions) — the metadata that drives
time-partitioning, orientation-aware thumbnailing and per-device quality
splits BEFORE any pixel decode. The reference stores only opaque objects
(no media handling in /root/reference); this extends the engine's
multimodal surface (`operators/multimodal.py`) with the typed-metadata
step, same design rules: REAL parse of the public format (EXIF 2.x = a
TIFF file embedded in a JPEG APP1 segment, TIFF 6.0 IFD structure), Arrow
`mapInPandas` over column-pruned (id, payload), payloads never shuffle.

Parsed: TIFF byte order (II little / MM big — both), IFD0 tags Make
(0x010F), Model (0x0110), Orientation (0x0112), DateTime (0x0132), and
the Exif sub-IFD (pointer tag 0x8769) tags DateTimeOriginal (0x9003),
PixelXDimension (0xA002), PixelYDimension (0xA003). Malformed segments
(truncated, bad magic, out-of-bounds offsets, IFD cycles) yield None
fields, never exceptions — corrupt cells must not kill a 100 TB scan.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

# TIFF field types → byte widths (subset we read; RATIONAL handled as 8)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_IFD0_TAGS = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
              0x0132: "datetime"}
_EXIF_TAGS = {0x9003: "datetime_original", 0xA002: "pixel_x",
              0xA003: "pixel_y"}
_EXIF_POINTER = 0x8769


def _read_entry(tiff: bytes, off: int, bo: str):
    """One 12-byte IFD entry → (tag, type, count, value bytes-or-int)."""
    tag, typ, cnt = struct.unpack(bo + "HHI", tiff[off:off + 8])
    size = _TYPE_SIZES.get(typ, 1) * cnt
    if size <= 4:
        raw = tiff[off + 8:off + 8 + size]
    else:
        (ptr,) = struct.unpack(bo + "I", tiff[off + 8:off + 12])
        if ptr + size > len(tiff):
            return tag, typ, cnt, None
        raw = tiff[ptr:ptr + size]
    return tag, typ, cnt, raw


def _decode_value(typ: int, cnt: int, raw: Optional[bytes], bo: str):
    if raw is None:
        return None
    if typ == 2:  # ASCII, NUL-terminated
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ == 3:  # SHORT
        return struct.unpack(bo + "H", raw[:2])[0]
    if typ == 4:  # LONG
        return struct.unpack(bo + "I", raw[:4])[0]
    return None


def _walk_ifd(tiff: bytes, off: int, bo: str, tags: dict, out: dict) -> None:
    if off + 2 > len(tiff):
        return
    (n,) = struct.unpack(bo + "H", tiff[off:off + 2])
    for i in range(n):
        eoff = off + 2 + 12 * i
        if eoff + 12 > len(tiff):
            return
        tag, typ, cnt, raw = _read_entry(tiff, eoff, bo)
        if tag in tags:
            out[tags[tag]] = _decode_value(typ, cnt, raw, bo)
        elif tag == _EXIF_POINTER and tags is _IFD0_TAGS:
            sub = _decode_value(4, 1, raw, bo)
            # guard against self/backward pointers (cycle-safe: one hop only)
            if isinstance(sub, int) and sub != off and sub + 2 <= len(tiff):
                _walk_ifd(tiff, sub, bo, _EXIF_TAGS, out)


def parse_exif(data: bytes) -> Optional[dict]:
    """EXIF fields of a JPEG payload, or None when no valid APP1/Exif
    segment exists. Never raises on malformed input."""
    try:
        if len(data) < 4 or data[:2] != b"\xff\xd8":
            return None
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS: no APP1 found before scan
                return None
            (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
            if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
                tiff = data[pos + 10:pos + 2 + seglen]
                if len(tiff) < 8:
                    return None
                order = tiff[:2]
                if order == b"II":
                    bo = "<"
                elif order == b"MM":
                    bo = ">"
                else:
                    return None
                magic, ifd0 = struct.unpack(bo + "HI", tiff[2:8])
                if magic != 42:
                    return None
                out: dict = {}
                _walk_ifd(tiff, ifd0, bo, _IFD0_TAGS, out)
                return out or None
            pos += 2 + seglen
        return None
    except Exception:
        return None


def build_exif_app1(
    *,
    make: str = "",
    model: str = "",
    orientation: int = 1,
    datetime_original: str = "",
    pixel_x: int = 0,
    pixel_y: int = 0,
    byte_order: str = "II",
) -> bytes:
    """A valid APP1/Exif segment (IFD0 + Exif sub-IFD) — the test/fixture
    encoder proving the parser against both byte orders."""
    bo = "<" if byte_order == "II" else ">"

    def entries(tag_values, data_start):
        # returns (packed entries, overflow data) given values already
        # normalized to (tag, type, count, payload bytes)
        packed, overflow = b"", b""
        for tag, typ, cnt, payload in tag_values:
            if len(payload) <= 4:
                val = payload.ljust(4, b"\x00")
            else:
                val = struct.pack(bo + "I", data_start + len(overflow))
                overflow += payload
            packed += struct.pack(bo + "HHI", tag, typ, cnt) + val
        return packed, overflow

    def ascii_v(tag, s):
        b = s.encode("ascii") + b"\x00"
        return (tag, 2, len(b), b)

    def short_v(tag, n):
        return (tag, 3, 1, struct.pack(bo + "H", n))

    def long_v(tag, n):
        return (tag, 4, 1, struct.pack(bo + "I", n))

    # Exif sub-IFD laid out after IFD0; compute sizes in two passes.
    sub_vals = [
        ascii_v(0x9003, datetime_original),
        long_v(0xA002, pixel_x),
        long_v(0xA003, pixel_y),
    ]
    ifd0_n = 5  # make, model, orientation, datetime, exif-pointer
    ifd0_size = 2 + 12 * ifd0_n + 4
    sub_off = 8 + ifd0_size  # sub-IFD directly follows IFD0
    sub_size = 2 + 12 * len(sub_vals) + 4
    sub_data_start = sub_off + sub_size
    sub_packed, sub_overflow = entries(sub_vals, sub_data_start)
    ifd0_data_start = sub_data_start + len(sub_overflow)
    ifd0_vals = [
        ascii_v(0x010F, make),
        ascii_v(0x0110, model),
        short_v(0x0112, orientation),
        ascii_v(0x0132, datetime_original),
        long_v(_EXIF_POINTER, sub_off),
    ]
    ifd0_packed, ifd0_overflow = entries(ifd0_vals, ifd0_data_start)

    tiff = (
        (b"II" if byte_order == "II" else b"MM")
        + struct.pack(bo + "HI", 42, 8)
        + struct.pack(bo + "H", ifd0_n) + ifd0_packed + struct.pack(bo + "I", 0)
        + struct.pack(bo + "H", len(sub_vals)) + sub_packed
        + struct.pack(bo + "I", 0)
        + sub_overflow + ifd0_overflow
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def with_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI of an existing JPEG."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def extract_exif(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """EXIF columns per payload via Arrow ``mapInPandas`` — map-only,
    column-pruned to (id, payload), payloads never shuffle; payloads
    without valid EXIF yield NULL fields (not dropped: absence of
    metadata is itself a signal)."""
    schema = (
        f"{id_col} long, make string, model string, orientation int, "
        "datetime string, datetime_original string, pixel_x long, pixel_y long"
    )
    fields = ("make", "model", "orientation", "datetime",
              "datetime_original", "pixel_x", "pixel_y")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict = {id_col: list(pdf[id_col])}
            parsed = [
                parse_exif(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            for f in fields:
                cols[f] = [(d or {}).get(f) for d in parsed]
            yield pd.DataFrame(cols)

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def synthesize_exif_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic EXIF-bearing JPEGs per id (fields are closed-form in
    the id; byte order alternates II/MM by parity) — the fixture generator
    whose inverse `extract_exif` must reproduce, letting a DuckDB oracle
    check the full build→parse round trip by id arithmetic alone."""
    from .jpeg import synth_jpeg_bytes

    schema = f"{id_col} long, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                ts = f"2024:01:{mid % 28 + 1:02d} {mid % 24:02d}:00:00"
                app1 = build_exif_app1(
                    make=f"Cam{mid % 3}",
                    model=f"M-{mid % 5}",
                    orientation=mid % 8 + 1,
                    datetime_original=ts,
                    pixel_x=8 * (4 + mid % 7),
                    pixel_y=8 * (4 + mid % 4),
                    byte_order="II" if mid % 2 == 0 else "MM",
                )
                payloads.append(with_exif(synth_jpeg_bytes(mid), app1))
            yield pd.DataFrame({id_col: list(pdf[id_col]), "payload": payloads})

    return df.select(id_col).mapInPandas(run, schema)
