"""End-to-end streaming lifecycles (SURVEY §3.2/§3.3 in streaming mode).

Batch mode runs the same logic over bounded tables; these compositions wire
the streaming pieces into the reference's two big pipelines:

  §3.2  raw events ─watermarked windows─► stats ─J1 static-join defs─►
        metrics_{freq} rows ─► partitioned lake (streaming ingest sink)
  §3.3  stats ─broadcast sla_defs join─► datapoints ─stateful machine─►
        alarm states / transitions

The enrichment joins are stream-static (defs are bounded and broadcast) —
no stream-stream join anywhere, so state is only the open windows plus the
per-SLA ring buffers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.stats import percentiles_in_defs, pick_statistic
from ..functions.timeutil import iso8601, partition_cols
from ..operators.metrics import series_unique_id
from .alarm_state import streaming_alarm_states
from .stats import streaming_metric_windows


def streaming_scrape(
    raw_stream: DataFrame,
    metric_defs: DataFrame,
    frequency: str,
    *,
    period_seconds: int,
    account_id: str = "123412341234",
    region: str = "us-east-1",
    watermark_delay: str = "10 minutes",
    collection_time: Column | None = None,
) -> DataFrame:
    """Streaming §3.2: windowed stats + J1 defs enrichment → append-mode
    stream of ``metrics_{frequency}`` §1.3 rows (one period per stream; run
    one query per distinct period, the A2 grouping).

    Output schema matches batch ``operators.metrics.scrape_metrics`` so the
    same lake writer and downstream consumers apply.
    """
    defs_filtered = metric_defs.filter(
        (F.col("frequency") == frequency) & (F.col("period") == period_seconds)
    )
    # Defs are bounded and tiny (broadcast below); resolve the declared pNN
    # statistics driver-side at query-build time so the windowed aggregation
    # carries the matching percentile_approx sketches (without this, pNN defs
    # would silently select NULL from the stats struct).
    pcts = percentiles_in_defs(
        [r["statistic"] for r in defs_filtered.select("statistic").distinct().collect()]
    )
    agg = streaming_metric_windows(
        raw_stream, period_seconds, watermark_delay=watermark_delay, percentiles=pcts or None
    ).withColumn(
        "id",
        series_unique_id(F.col("namespace"), F.col("name"), F.lit(frequency), F.col("dimensions")),
    )
    defs_f = defs_filtered.select(
        F.col("namespace").alias("d_namespace"),
        F.col("name").alias("d_name"),
        "period",
        "statistic",
        F.col("metadata").alias("d_metadata"),
        F.col("dimensions").alias("d_dimensions"),
        series_unique_id(
            F.col("namespace"), F.col("name"), F.lit(frequency), F.col("dimensions")
        ).alias("d_id"),
    )
    joined = agg.join(F.broadcast(defs_f), agg["id"] == defs_f["d_id"], "inner")
    ct = collection_time if collection_time is not None else F.current_timestamp()
    return joined.select(
        iso8601(ct).alias("collectiontime"),
        F.col("d_namespace").alias("namespace"),
        F.col("d_name").alias("name"),
        F.col("period").cast("int").alias("period"),
        F.lit(frequency).alias("frequency"),
        F.col("statistic"),
        F.col("d_metadata").alias("metadata"),
        F.col("d_dimensions").alias("dimensions"),
        F.lit(account_id).alias("accountid"),
        iso8601(F.col("window_start")).alias("metrictimestamp"),
        pick_statistic(F.col("stats"), F.col("statistic"), pcts or None)
        .cast("double")
        .alias("metricvalue"),
        F.col("id"),
        F.col("d_name").alias("label"),
        F.lit(region).alias("region"),
        *partition_cols(F.col("window_start")),
    )


def streaming_sla_pipeline(
    metrics_stream: DataFrame,
    sla_defs: DataFrame,
    *,
    series_id: Column | None = None,
    ws: Column | None = None,
    value: Column | None = None,
) -> DataFrame:
    """Streaming §3.3: published metric datapoints → broadcast SLA-defs join
    → stateful m-of-n alarm machine (append-mode alarm-state stream).

    ``metrics_stream`` is a stream over *published* datapoints — e.g. a file
    stream on the metrics lake that ``streaming_scrape`` writes. Two chained
    queries (scrape → lake → SLA) is both a Spark constraint (a stateful op
    can't follow a streaming aggregation in append mode) and the reference's
    own topology: CloudWatch alarms evaluate published metrics, not the
    in-flight scrape (SURVEY §3.3).

    Column overrides adapt arbitrary schemas; defaults assume §1.3 metrics
    rows (``id``, ISO ``metrictimestamp``, ``metricvalue``).

    ``sla_defs``: (sla_id, series_id, threshold, comparison_operator,
    datapoints_to_alarm, evaluation_periods, treat_missing_data, period) —
    ``series_id`` matching the C1 unique_id of the metric series.
    """
    sid = series_id if series_id is not None else F.col("id")
    wcol = ws if ws is not None else F.unix_timestamp(F.to_timestamp(F.col("metrictimestamp")))
    vcol = value if value is not None else F.col("metricvalue").cast("double")
    datapoints = (
        metrics_stream.select(
            sid.alias("series_id"), wcol.cast("long").alias("ws"), vcol.alias("value")
        )
        .join(F.broadcast(sla_defs), "series_id")
        .select(
            "sla_id",
            "ws",
            "value",
            "threshold",
            "comparison_operator",
            "datapoints_to_alarm",
            "evaluation_periods",
            "treat_missing_data",
            F.col("period").cast("int").alias("period"),
        )
    )
    return streaming_alarm_states(datapoints)
