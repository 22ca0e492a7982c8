"""Real stdlib media decode: PNG (all 5 filter types, gray + RGB), BMP,
GIF, WAV (s16/u8, chunk alignment), and the Spark-side real-decode path
used by the `multimodal_features` / `audio_features` declared queries.

The synthetic encoders (`synth_png_bytes`/`synth_wav_bytes`) emit REAL
container files whose pixel/sample values follow a closed-form formula, so
these tests prove the decoder inverts the encoder — the same contract the
DuckDB oracle checks at the query level.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
    decode_bmp,
    decode_gif,
    decode_image,
    decode_png,
    decode_wav,
    extract_audio_features,
    extract_image_features,
    synth_png_bytes,
    synth_wav_bytes,
    synthesize_media,
)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _build_png(pixels, ctype: int, filters) -> bytes:
    """Forward-apply the given PNG filter per scanline (spec §9) so the
    decoder's unfiltering is tested against a known pixel matrix."""
    h = len(pixels)
    w = len(pixels[0]) // (3 if ctype == 2 else 1)
    bpp = 3 if ctype == 2 else 1
    stride = w * bpp
    flat = [b for row in pixels for b in row]
    raw = bytearray()
    for y in range(h):
        ftype = filters[y % len(filters)]
        raw.append(ftype)
        for i in range(stride):
            cur = flat[y * stride + i]
            a = flat[y * stride + i - bpp] if i >= bpp else 0
            b = flat[(y - 1) * stride + i] if y > 0 else 0
            c = flat[(y - 1) * stride + i - bpp] if (y > 0 and i >= bpp) else 0
            if ftype == 0:
                enc = cur
            elif ftype == 1:
                enc = (cur - a) & 0xFF
            elif ftype == 2:
                enc = (cur - b) & 0xFF
            elif ftype == 3:
                enc = (cur - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = (cur - pred) & 0xFF
            raw.append(enc)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_all_filter_types_grayscale():
    pixels = [
        [10, 200, 30, 45],
        [99, 1, 255, 0],
        [7, 7, 7, 7],
        [128, 64, 32, 16],
        [250, 251, 252, 253],
    ]
    expected_mean = sum(sum(r) for r in pixels) / 20 / 255.0
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        w, h, luma = decode_png(_build_png(pixels, 0, filters))
        assert (w, h) == (4, 5)
        assert luma == pytest.approx(expected_mean, abs=1e-12), filters


def test_png_rgb_bt601_luma():
    # 2x2 RGB: known colors
    rows = [[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]]
    w, h, luma = decode_png(_build_png(rows, 2, [4]))
    assert (w, h) == (2, 2)
    exp = (0.299 * 255 + 0.587 * 255 + 0.114 * 255 + (0.299 + 0.587 + 0.114) * 255) / 4 / 255.0
    assert luma == pytest.approx(exp, abs=1e-12)


def test_png_unsupported_color_type_returns_dims_only():
    # color type 6 (RGBA) → dims parsed, luma None
    ihdr = struct.pack(">IIBBBBB", 9, 5, 8, 6, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(data) == (9, 5, None)


def test_synth_png_roundtrip_matches_formula():
    for mid in (0, 1, 12, 91, 4999):
        w, h, luma = decode_png(synth_png_bytes(mid))
        ew, eh = 4 + mid % 13, 3 + mid % 7
        assert (w, h) == (ew, eh)
        total = sum((mid + 31 * x + 17 * y) % 256 for y in range(eh) for x in range(ew))
        assert luma == pytest.approx(total / (ew * eh) / 255.0, abs=1e-15)


def test_bmp_24bit_with_row_padding():
    # width 3 → stride 12 (3 bytes padding/row), bottom-up
    w, h = 3, 2
    stride = (w * 3 + 3) & ~3
    pix = bytearray()
    for _ in range(h):
        pix += bytes([10, 20, 30] * w) + b"\x00" * (stride - w * 3)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    )
    bw, bh, luma = decode_bmp(hdr + bytes(pix))
    assert (bw, bh) == (3, 2)
    assert luma == pytest.approx((0.299 * 30 + 0.587 * 20 + 0.114 * 10) / 255.0, abs=1e-12)


def test_gif_header():
    data = b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00" * 7
    assert decode_gif(data) == (640, 480, None)


def test_decode_image_dispatch():
    assert decode_image(synth_png_bytes(5))[0] == 4 + 5 % 13
    assert decode_image(b"GIF87a" + struct.pack("<HH", 1, 2) + b"\x00" * 7) == (1, 2, None)
    assert decode_image(b"\xff\xd8\xff unknown-jpeg") == (None, None, None)


def test_wav_s16_roundtrip_and_rms():
    for mid, n in ((0, 10), (3, 333), (4999, 510)):
        sr, dur, rms = decode_wav(synth_wav_bytes(mid, n))
        assert sr == 16000
        assert dur == pytest.approx(n / 16000.0, abs=1e-15)
        sumsq = sum(((mid * 31 + i * 7) % 2001 - 1000) ** 2 for i in range(n))
        assert rms == pytest.approx((sumsq / n) ** 0.5 / 32768.0, abs=1e-15)


def test_wav_u8_and_odd_chunk_alignment():
    # u8 mono 8 kHz, 3 samples (odd data length → pad byte), plus an
    # unknown LIST chunk the walker must skip.
    samples = bytes([128, 255, 0])
    data = (
        b"RIFF"
        + struct.pack("<I", 0)  # size field unused by the decoder
        + b"WAVE"
        + b"LIST"
        + struct.pack("<I", 4)
        + b"INFO"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data"
        + struct.pack("<I", 3)
        + samples
        + b"\x00"  # word-align pad
    )
    sr, dur, rms = decode_wav(data)
    assert sr == 8000
    assert dur == pytest.approx(3 / 8000.0)
    sumsq = (128 - 128) ** 2 + (255 - 128) ** 2 + (0 - 128) ** 2
    assert rms == pytest.approx((sumsq / 3) ** 0.5 / 128.0, abs=1e-15)


def test_wav_non_pcm_returns_no_rms():
    data = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 44100, 44100 * 4, 4, 32)  # IEEE float
        + b"data" + struct.pack("<I", 8) + b"\x00" * 8
    )
    sr, dur, rms = decode_wav(data)
    assert sr == 44100 and rms is None
    assert dur == pytest.approx(2 / 44100.0)


def test_spark_real_decode_pipeline(spark):
    """End-to-end through Spark: synthesize real PNG/WAV payloads, decode
    through the fake=False mapInPandas path, check against the formula."""
    ids = spark.range(0, 40).selectExpr("id AS media_id")
    img = extract_image_features(synthesize_media(ids, kind="image")).collect()
    assert len(img) == 40
    for r in img:
        mid = r["media_id"]
        assert r["width"] == 4 + mid % 13
        assert r["height"] == 3 + mid % 7
        total = sum(
            (mid + 31 * x + 17 * y) % 256
            for y in range(r["height"])
            for x in range(r["width"])
        )
        assert r["mean_luma"] == pytest.approx(total / (r["width"] * r["height"]) / 255.0)

    aud_in = spark.range(0, 40).selectExpr(
        "id AS media_id", "CAST(id % 97 + 10 AS INT) AS n_samples"
    )
    aud = extract_audio_features(synthesize_media(aud_in, kind="audio")).collect()
    assert len(aud) == 40
    for r in aud:
        mid, n = r["media_id"], r["media_id"] % 97 + 10
        assert r["sample_rate"] == 16000
        assert r["n_bytes"] == 44 + 2 * n
        sumsq = sum(((mid * 31 + i * 7) % 2001 - 1000) ** 2 for i in range(n))
        assert r["rms"] == pytest.approx((sumsq / n) ** 0.5 / 32768.0, abs=1e-15)


def test_png_gray_pixels_and_resize():
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
        decode_png_gray_pixels,
        resize_nearest,
        synth_png_bytes,
    )

    # synthetic PNG: pixel(x,y) = (id + 31x + 17y) % 256
    mid = 7
    w, h, gray = decode_png_gray_pixels(synth_png_bytes(mid))
    assert (w, h) == (4 + mid % 13, 3 + mid % 7) and len(gray) == w * h
    for y in range(h):
        for x in range(w):
            assert gray[y * w + x] == (mid + 31 * x + 17 * y) % 256
    # nearest-neighbor: cell (x,y) samples (x*w//s, y*h//s)
    thumb = resize_nearest(gray, w, h, 2)
    assert len(thumb) == 4
    for cell, (tx, ty) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
        sx, sy = tx * w // 2, ty * h // 2
        assert thumb[cell] == gray[sy * w + sx]
    # RGB PNGs resolve through rounded BT.601 luma
    rows = [[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]]
    w2, h2, g2 = decode_png_gray_pixels(_build_png(rows, 2, [2]))
    assert (w2, h2) == (2, 2)
    assert list(g2) == [76, 150, 29, 255]  # round(BT.601) of R,G,B,white


def test_thumbnail_mapinpandas_null_for_non_png(spark):
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import extract_image_thumbnails

    df = spark.createDataFrame([(1, bytearray(b"not a png"))], "media_id long, payload binary")
    row = extract_image_thumbnails(df, size=2).collect()[0]
    assert row["thumb"] is None


def test_gif_full_decode_matches_formula():
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
        decode_gif,
        decode_image,
        synth_gif_bytes,
    )

    for mid in (0, 5, 38, 1234):
        w, h, luma = decode_gif(synth_gif_bytes(mid))
        ew, eh = 4 + mid % 13, 3 + mid % 7
        assert (w, h) == (ew, eh)
        exp = sum(
            (mid + 31 * x + 17 * y) % 256 for y in range(eh) for x in range(ew)
        ) / (ew * eh) / 255.0
        assert luma == pytest.approx(exp, abs=1e-12), mid
        # dispatcher routes GIFs to the same decoder
        assert decode_image(synth_gif_bytes(mid)) == (w, h, luma)


def test_gif_lzw_growing_dictionary():
    """A real LZW stream (dictionary growth + KwKwK case), not just the
    degenerate CLEAR-per-pixel encoding the synthesizer emits."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import _gif_lzw_decode

    # [1,2,2,1] with min_code_size=2 (clear=4, end=5): the decoder's table
    # reaches 8 entries after the third data code, so the LAST two codes are
    # read at 4 bits — the encoding must track that width growth.
    codes = [(4, 3), (1, 3), (2, 3), (2, 3), (1, 4), (5, 4)]
    bits = bytearray(); acc = n = 0
    for c, size in codes:
        acc |= c << n; n += size
        while n >= 8:
            bits.append(acc & 0xFF); acc >>= 8; n -= 8
    if n: bits.append(acc & 0xFF)
    assert _gif_lzw_decode(2, bytes(bits)) == [1, 2, 2, 1]
    # KwKwK: [3,3,3,3,3] encodes as CLEAR,3,6(=3,3 — the code being defined),
    # 6 again, then END — at 4 bits, since the table hit 8 entries
    codes2 = [(4, 3), (3, 3), (6, 3), (6, 3), (5, 4)]
    bits2 = bytearray(); acc = n = 0
    for c, size in codes2:
        acc |= c << n; n += size
        while n >= 8:
            bits2.append(acc & 0xFF); acc >>= 8; n -= 8
    if n: bits2.append(acc & 0xFF)
    assert _gif_lzw_decode(2, bytes(bits2)) == [3, 3, 3, 3, 3]


def test_bmp_thumbnail_through_pipeline(spark):
    """BMP payloads resolve through the fused decode+resize path too,
    bottom-up row order normalized (top row of the image = top of thumb)."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
        decode_bmp_gray_pixels,
        extract_image_thumbnails,
    )

    # 2x2 24-bit BMP, bottom-up: file row 0 = image BOTTOM row.
    # image top row = (white, white), bottom row = (black, black)
    def px(b, g, r):
        return bytes([b, g, r])

    row_bottom = px(0, 0, 0) + px(0, 0, 0) + b"\x00\x00"      # padded to 8
    row_top = px(255, 255, 255) + px(255, 255, 255) + b"\x00\x00"
    header = (
        b"BM" + struct.pack("<IHHI", 54 + 16, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    )
    bmp = header + row_bottom + row_top
    w, h, gray = decode_bmp_gray_pixels(bmp)
    assert (w, h) == (2, 2)
    assert list(gray) == [255, 255, 0, 0]  # top row first after normalization

    df = spark.createDataFrame([(9, bytearray(bmp))], "media_id long, payload binary")
    row = extract_image_thumbnails(df, size=2).collect()[0]
    assert row["thumb"] == [255, 255, 0, 0]
