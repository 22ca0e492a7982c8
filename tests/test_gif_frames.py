"""Animated-GIF frame extraction: multi-frame LZW decode, canvas
compositing (sub-rectangles, transparency, disposal methods), the Spark
frame-extraction operator, and frame-level pHash dedup."""

import struct

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
    _pack_gif_indices,
    decode_gif_frames,
    extract_frame_phash,
    extract_video_frames,
    synth_animated_gif_bytes,
    synthesize_media,
)

GRAY_PAL = bytes(v for i in range(256) for v in (i, i, i))


def _gce(delay=0, transparent=None, disposal=0):
    flags = (disposal << 2) | (1 if transparent is not None else 0)
    return (
        b"\x21\xf9\x04"
        + bytes([flags])
        + struct.pack("<H", delay)
        + bytes([transparent or 0, 0])
    )


def _frame(left, top, w, h, values):
    return (
        b"\x2C"
        + struct.pack("<HHHHB", left, top, w, h, 0)
        + bytes([8])
        + _pack_gif_indices(values)
    )


def _gif(w, h, body, bg=0):
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0xF7, bg, 0)
        + GRAY_PAL
        + body
        + b"\x3B"
    )


def test_multiframe_roundtrip():
    for mid in (0, 3, 11):
        nf = 2 + mid % 4
        w, h, frames = decode_gif_frames(synth_animated_gif_bytes(mid, nf))
        assert len(frames) == nf
        for idx, delay, gray in frames:
            assert delay == 2
            exp = [
                (mid + 31 * x + 17 * y + 97 * idx) % 256
                for y in range(h)
                for x in range(w)
            ]
            assert list(gray) == exp


def test_subrect_composites_onto_previous_canvas():
    """Frame 2 paints only a 2×2 patch — the rest of the canvas must keep
    frame 1's pixels (disposal 0 = leave in place)."""
    body = _frame(0, 0, 4, 4, [10] * 16) + _frame(1, 1, 2, 2, [200] * 4)
    w, h, frames = decode_gif_frames(_gif(4, 4, body))
    assert len(frames) == 2
    f2 = list(frames[1][2])
    for y in range(4):
        for x in range(4):
            expect = 200 if (1 <= x <= 2 and 1 <= y <= 2) else 10
            assert f2[y * 4 + x] == expect


def test_transparent_index_preserves_underlying_pixels():
    patch = [200, 99, 99, 200]  # 99 marked transparent
    body = (
        _frame(0, 0, 4, 4, [10] * 16)
        + _gce(transparent=99)
        + _frame(1, 1, 2, 2, patch)
    )
    _w, _h, frames = decode_gif_frames(_gif(4, 4, body))
    f2 = list(frames[1][2])
    assert f2[1 * 4 + 1] == 200   # opaque patch pixel
    assert f2[1 * 4 + 2] == 10    # transparent → frame 1 shows through
    assert f2[2 * 4 + 1] == 10
    assert f2[2 * 4 + 2] == 200


def test_disposal_restore_background_and_previous():
    # disposal 2: after frame 2, its rect resets to background before frame 3
    body = (
        _frame(0, 0, 4, 4, [10] * 16)
        + _gce(disposal=2)
        + _frame(0, 0, 2, 2, [200] * 4)
        + _gce(transparent=0)
        + _frame(0, 0, 4, 4, [0] * 16)  # fully transparent: reveals canvas
    )
    _w, _h, frames = decode_gif_frames(_gif(4, 4, body, bg=77))
    f3 = list(frames[2][2])
    assert f3[0] == 77   # background restored where frame 2 painted
    assert f3[15] == 10  # untouched area still frame 1

    # disposal 3: canvas reverts to the PREVIOUS state after the frame
    body = (
        _frame(0, 0, 4, 4, [10] * 16)
        + _gce(disposal=3)
        + _frame(0, 0, 4, 4, [200] * 16)
        + _gce(transparent=0)
        + _frame(0, 0, 4, 4, [0] * 16)
    )
    _w, _h, frames = decode_gif_frames(_gif(4, 4, body))
    assert list(frames[1][2]) == [200] * 16
    assert list(frames[2][2]) == [10] * 16  # previous state restored


def test_delay_and_gce_scope():
    body = (
        _gce(delay=50) + _frame(0, 0, 2, 2, [1] * 4)
        + _frame(0, 0, 2, 2, [2] * 4)  # no GCE → default delay 0
    )
    _w, _h, frames = decode_gif_frames(_gif(2, 2, body))
    assert [f[1] for f in frames] == [50, 0]


def test_spark_extract_video_frames(spark):
    from pyspark.sql import functions as F

    docs = spark.range(0, 12).select(
        F.col("id").alias("media_id"),
        (F.lit(2) + F.col("id") % 4).cast("int").alias("n_frames"),
    )
    media = synthesize_media(docs, kind="video")
    rows = extract_video_frames(media, every_nth=2).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(range(12))
    for mid, rs in by_media.items():
        nf = 2 + mid % 4
        assert sorted(r["frame_idx"] for r in rs) == list(range(0, nf, 2))
        assert all(r["n_frames"] == nf and r["delay_cs"] == 2 for r in rs)


def test_frame_phash_finds_shared_frames(spark):
    """Two videos share their frame sequence (planted re-encode) — every
    sampled frame pair must collide at hamming distance 0."""
    from pyspark.sql import functions as F

    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import (
        hamming_pairs,
    )

    docs = spark.range(0, 6).select(
        F.col("id").alias("media_id"),
        # id 5 re-uses id 4's content (same seed → same frames)
        F.when(F.col("id") == 5, F.lit(4)).otherwise(F.col("id")).alias("seed"),
        F.lit(3).alias("n_frames"),
    )
    synth = synthesize_media(
        docs.select(F.col("seed").alias("media_id"), "n_frames").distinct(),
        kind="video",
    ).withColumnRenamed("media_id", "seed")
    media = docs.join(synth, "seed").select("media_id", "payload")
    hashed = extract_frame_phash(media).withColumn(
        "key", F.concat_ws(":", "media_id", "frame_idx")
    )
    pairs = hamming_pairs(hashed, "key", "phash", max_hamming=0).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {("4:0", "5:0"), ("4:1", "5:1"), ("4:2", "5:2")} <= got
    # and no cross-frame-index collisions within a video
    assert not any(a.split(":")[0] == b.split(":")[0] for a, b in got)
