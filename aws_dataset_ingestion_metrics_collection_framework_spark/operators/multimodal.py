"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (image/audio libraries are not in this
container): ``decode_image_batch`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder produces stable
feature rows — the Spark-side plumbing (schema, batch iteration, partition
pass-through, column pruning before the UDF) is real and tested.

Scale notes: binary payloads never shuffle — metadata extraction happens in
a map-only stage; downstream joins/aggregations use only the extracted
columns. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
memory for large blobs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.StringType()),  # JSON metadata string
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real image decode: derives stable
    pseudo-dimensions and luminance from the payload length (length-only so
    an external SQL oracle can replicate it exactly)."""
    n = len(payload)
    width = 64 + (n % 512)
    height = 64 + ((n // 7) % 512)
    mean_luma = ((n * 7) % 256) / 255.0
    return width, height, mean_luma


def extract_image_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Map-only feature extraction over binary image payloads.

    Real deployments replace the body of ``decode`` with PIL/libvips; the
    batch shape, schema, and partitioning are production-ready as-is.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires an image library not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                w, h, luma = _fake_decode(payload)
                rows.append((media_id, w, h, len(payload), luma))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "mean_luma"]
            )

    # prune to the two needed columns BEFORE the python boundary
    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _fake_decode_audio(payload: bytes) -> tuple[int, float, float]:
    """Deterministic stand-in for an audio decode (length-only so an external
    SQL oracle can replicate it): fixed 16 kHz mono s16, RMS derived from the
    byte length."""
    n = len(payload)
    sample_rate = 16000
    duration_s = n / (2.0 * sample_rate)  # s16 mono
    rms = ((n * 13) % 1000) / 1000.0
    return sample_rate, duration_s, rms


def extract_audio_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Map-only audio feature extraction over binary payloads — same
    plumbing contract as ``extract_image_features`` (real deployments swap
    the decode body for soundfile/ffmpeg)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decoding requires an audio library not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                sr, dur, rms = _fake_decode_audio(payload)
                rows.append((media_id, sr, dur, len(payload), rms))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "duration_s", "n_bytes", "rms"]
            )

    return df.select("media_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, *, every_nth: int = 30) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_idx) rows; the decode remains stubbed like images. Demonstrates
    fan-out (one row → many) without shuffling payloads."""
    meta_frames = F.coalesce(
        F.get_json_object(F.col("meta"), "$.n_frames").cast("int"), F.lit(0)
    )
    return (
        df.filter(F.col("media_type") == "video")
        .select("media_id", meta_frames.alias("n_frames"))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_nth)
                )
            ).alias("frame_idx"),
        )
    )
