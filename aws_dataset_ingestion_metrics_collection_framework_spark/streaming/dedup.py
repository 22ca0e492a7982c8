"""Streaming exact dedup — the continuous-ingest counterpart of
``operators.dedup.exact_dedup`` (training pipelines dedup at ingest time so
duplicates never land in the lake).

Built on ``dropDuplicatesWithinWatermark``: state holds one entry per
distinct key seen within the watermark horizon and the watermark evicts
older entries, so state is bounded by (dedup horizon × arrival rate) —
never by stream length. One shuffle on the dedup key per micro-batch;
late rows beyond the watermark are dropped by the engine upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    df: DataFrame,
    content_cols: list[str],
    *,
    event_time_col: str,
    watermark: str = "10 minutes",
    hash_only: bool = False,
) -> DataFrame:
    """Keep the first arrival of each distinct content within the watermark
    horizon.

    Default keys state on the content columns themselves — exact, like the
    batch operator's collision-safe contract. ``hash_only=True`` keys on
    xxhash64(content) instead: state rows shrink to 8 bytes + timestamp
    (the choice at 100 TB with wide documents), trading a ~|pairs|/2^64
    silent-merge probability — the same tradeoff the batch docstring
    documents, made explicit here because streaming state lives in memory.
    """
    if hash_only:
        keyed = df.withColumn(
            "_content_hash", F.xxhash64(*[F.col(c) for c in content_cols])
        )
        out = (
            keyed.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(["_content_hash"])
            .drop("_content_hash")
        )
        return out
    return df.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        content_cols
    )
