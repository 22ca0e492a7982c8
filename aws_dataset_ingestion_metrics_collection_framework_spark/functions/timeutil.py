"""Time helpers (SURVEY §2.7 C8-C9, §2.5 W2).

UTC-everywhere discipline: the engine sets ``spark.sql.session.timeZone=UTC``
(session.py) and formats ISO-8601 strings only at the storage edge, fixing
the reference's naive utcnow/now mix (SURVEY §7 hard-parts #3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ssxxx"  # 2026-08-13T00:00:00+00:00


def iso8601(ts: Column) -> Column:
    """ISO-8601 with offset, matching ``datetime.isoformat()`` of the
    reference's tz-aware timestamps (ref:lambda/metric_stream_producer.py:124)."""
    return F.date_format(ts, ISO_FMT)


def floor_to_10min(ts: Column) -> Column:
    """W2 — floor to the most recent 10-minute boundary
    (ref:lambda/metric_stream_producer.py:40-43: subtract minute%10, zero
    seconds/microseconds)."""
    return F.timestamp_seconds(F.floor(F.unix_timestamp(ts) / 600) * 600)


def partition_cols(ts: Column) -> list[Column]:
    """C9 — Firehose `!{timestamp:yyyy}/MM/dd/HH` prefix templating
    (ref:stacks/metrics_streamer.py:90,142) as derived partition columns."""
    return [
        F.year(ts).cast("smallint").alias("year"),
        F.month(ts).cast("smallint").alias("month"),
        F.dayofmonth(ts).cast("smallint").alias("day"),
        F.hour(ts).cast("smallint").alias("hour"),
    ]
