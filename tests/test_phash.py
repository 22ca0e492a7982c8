"""Perceptual-hash tests: pHash robustness + banded Hamming pair join."""

import struct
import zlib

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import hamming_pairs
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
    _PNG_MAGIC,
    extract_image_phash,
    phash64,
)


def _png_gray(w, h, pixel_fn):
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        for x in range(w):
            raw.append(pixel_fn(x, y) % 256)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def _gradient(x, y):
    return 2 * x + y


def _checker(x, y):
    return 255 if (x // 8 + y // 8) % 2 else 0


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_invariants():
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import decode_png_gray_pixels

    g = _png_gray(64, 48, _gradient)
    w, h, gray = decode_png_gray_pixels(g)
    p1 = phash64(gray, w, h)
    assert phash64(gray, w, h) == p1                      # deterministic
    # one-pixel change: perceptually identical → tiny Hamming distance
    g2 = _png_gray(64, 48, lambda x, y: 200 if (x, y) == (5, 5) else _gradient(x, y))
    _, _, gray2 = decode_png_gray_pixels(g2)
    assert _ham(p1, phash64(gray2, w, h)) <= 8
    # structurally different image → far away
    c = _png_gray(64, 48, _checker)
    _, _, gray3 = decode_png_gray_pixels(c)
    assert _ham(p1, phash64(gray3, w, h)) >= 12


def test_audio_fingerprint_invariants():
    import numpy as np

    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
        audio_fingerprint64,
    )

    t = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 440 * t)
    fp = audio_fingerprint64(tone, 16000)
    assert audio_fingerprint64(tone, 16000) == fp            # deterministic
    rng = np.random.RandomState(7)
    noisy = tone + 0.01 * rng.randn(tone.size)
    assert _ham(fp, audio_fingerprint64(noisy, 16000)) <= 8   # same content
    assert _ham(fp, audio_fingerprint64(0.5 * tone, 16000)) <= 8  # level change
    other = np.sin(2 * np.pi * 3000 * t)
    assert _ham(fp, audio_fingerprint64(other, 16000)) >= 12  # different tone


def test_audio_fingerprint_pipeline(spark):
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
        extract_audio_fingerprints,
        synth_wav_bytes,
    )

    rows = [
        (0, bytearray(synth_wav_bytes(0, 8000))),
        (1, bytearray(synth_wav_bytes(0, 8000))),   # exact duplicate payload
        (2, bytearray(synth_wav_bytes(9, 8000))),   # different content
        (3, bytearray(b"RIFFbroken")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["fingerprint"]
           for r in extract_audio_fingerprints(df).collect()}
    assert got[3] is None
    assert got[0] == got[1] and got[0] is not None
    pairs = hamming_pairs(
        extract_audio_fingerprints(df).filter("fingerprint IS NOT NULL"),
        "media_id", "fingerprint", max_hamming=0,
    ).collect()
    assert ([(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
            or got[2] == got[0])  # synth tones could legitimately collide


def test_phash_pipeline_finds_near_dup_images(spark):
    rows = [
        (0, bytearray(_png_gray(64, 48, _gradient))),
        (1, bytearray(_png_gray(64, 48,                       # near-dup of 0
            lambda x, y: 90 if (x, y) == (3, 7) else _gradient(x, y)))),
        (2, bytearray(_png_gray(64, 48, _checker))),          # different
        (3, bytearray(b"not an image")),                      # undecodable
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = extract_image_phash(df)
    got = {r["media_id"]: r["phash"] for r in hashes.collect()}
    assert got[3] is None and None not in (got[0], got[1], got[2])
    pairs = hamming_pairs(
        hashes.filter("phash IS NOT NULL"), "media_id", "phash", max_hamming=8
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
