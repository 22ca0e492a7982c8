"""Streaming statistic engine — watermarked windowed aggregation.

The batch statistic engine (operators/metrics.py, SURVEY §2.4 A1 / §2.5 W1)
re-expressed over an unbounded stream: the SAME one-pass stats struct
(functions/stats.py) under ``withWatermark + window``. The reference has no
event-time handling at all (scrape-time == processing-time, SURVEY §2.9);
the watermark is the engine's correctness improvement for late data (W5 —
the 10-minute figure mirrors the reference's 10-minute scrape alignment,
ref:lambda/metric_stream_producer.py:40-43).

Scale: streaming state = one partial-aggregate row per open (series, window)
— map-side combine applies within each micro-batch, and the watermark bounds
state growth (closed windows are evicted once event time passes
window_end + delay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.stats import all_statistics_struct


def streaming_metric_windows(
    raw_stream: DataFrame,
    period_seconds: int,
    *,
    watermark_delay: str = "10 minutes",
    percentiles: list[float] | None = None,
) -> DataFrame:
    """Tumbling-window multi-statistic aggregation over a raw-event stream.

    Input : stream of (namespace, name, dimensions, ts timestamp, value)
            — same shape as the batch engine's raw_events (FIXTURES §1).
    Output: append-mode stream of finalized windows (emitted when the
            watermark passes window_end), schema identical to the batch
            ``compute_metric_windows`` so downstream enrichment (J1) and the
            lake writer are shared verbatim.

    Percentiles stream via the ``percentile_approx`` sketch (mergeable,
    constant memory per open window — exact percentile would buffer
    unboundedly); batch mode keeps the exact form where an oracle demands it.
    """
    w = F.window("ts", f"{period_seconds} seconds")
    return (
        raw_stream.withWatermark("ts", watermark_delay)
        .groupBy(w.alias("w"), "namespace", "name", "dimensions")
        .agg(all_statistics_struct(F.col("value"), percentiles, approx=True).alias("stats"))
        .select(
            "namespace",
            "name",
            "dimensions",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "stats",
        )
    )
