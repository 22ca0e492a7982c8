"""Statistic engine tests — windowed aggregation + enrichment join (A1/W1/J1)."""

import datetime as dt
import json

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import (
    METRIC_DEFS_SCHEMA,
    RAW_EVENTS_SCHEMA,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.metrics import (
    compute_metric_windows,
    latest_datapoint,
    scrape_metrics,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


def make_raw_events(spark):
    dims = json.dumps({"FunctionName": "hello_world"})
    rows = [
        # hour 0: values 1, 2, 3
        ("AWS/Lambda", "Invocations", dims, ts("2026-01-01T00:05:00"), 1.0),
        ("AWS/Lambda", "Invocations", dims, ts("2026-01-01T00:20:00"), 2.0),
        ("AWS/Lambda", "Invocations", dims, ts("2026-01-01T00:59:59"), 3.0),
        # hour 1: value 10
        ("AWS/Lambda", "Invocations", dims, ts("2026-01-01T01:00:00"), 10.0),
        # hour 3 (hour 2 missing): 7
        ("AWS/Lambda", "Invocations", dims, ts("2026-01-01T03:30:00"), 7.0),
        # other series, no def
        ("Other", "Thing", None, ts("2026-01-01T00:10:00"), 99.0),
        # second defined series, Average
        ("App", "Latency", None, ts("2026-01-01T00:10:00"), 100.0),
        ("App", "Latency", None, ts("2026-01-01T00:40:00"), 200.0),
    ]
    return spark.createDataFrame(rows, RAW_EVENTS_SCHEMA)


def make_defs(spark):
    dims = json.dumps({"FunctionName": "hello_world"})
    rows = [
        ("AWS/Lambda", "Invocations", "hour", 3600, "Sum", None, dims,
         "set1", None, "dash", "123412341234", None, None, None),
        ("App", "Latency", "hour", 3600, "Average", None, None,
         "set1", None, "dash", "123412341234", None, None, None),
    ]
    return spark.createDataFrame(rows, METRIC_DEFS_SCHEMA)


def test_compute_metric_windows(spark):
    agg = compute_metric_windows(make_raw_events(spark), 3600)
    rows = {
        (r["namespace"], r["name"], str(r["window_start"])): r["stats"]
        for r in agg.collect()
    }
    s = rows[("AWS/Lambda", "Invocations", "2026-01-01 00:00:00")]
    assert s["Sum"] == 6.0 and s["Minimum"] == 1.0 and s["Maximum"] == 3.0
    assert s["SampleCount"] == 3.0
    assert rows[("AWS/Lambda", "Invocations", "2026-01-01 01:00:00")]["Sum"] == 10.0
    assert ("AWS/Lambda", "Invocations", "2026-01-01 02:00:00") not in rows  # gap stays missing
    assert rows[("App", "Latency", "2026-01-01 00:00:00")]["Average"] == 150.0


def test_scrape_metrics_end_to_end(spark):
    out = scrape_metrics(
        make_raw_events(spark),
        make_defs(spark),
        "hour",
        account_id="123412341234",
        region="us-east-1",
        collection_time=F.lit("2026-01-02 00:00:00").cast("timestamp"),
    )
    rows = out.collect()
    # 3 Invocations windows + 1 Latency window; undeclared 'Other' dropped by J1
    assert len(rows) == 4
    by_key = {(r["name"], r["metrictimestamp"]): r for r in rows}
    inv0 = by_key[("Invocations", "2026-01-01T00:00:00+00:00")]
    assert inv0["metricvalue"] == 6.0
    assert inv0["statistic"] == "Sum"
    assert inv0["period"] == 3600
    assert inv0["frequency"] == "hour"
    assert inv0["id"] == "awslambdainvocationshourfunctionnamehello_world"
    assert json.loads(inv0["dimensions"]) == {"FunctionName": "hello_world"}
    assert inv0["region"] == "us-east-1"
    assert (inv0["year"], inv0["month"], inv0["day"], inv0["hour"]) == (2026, 1, 1, 0)
    assert inv0["collectiontime"] == "2026-01-02T00:00:00+00:00"
    lat = by_key[("Latency", "2026-01-01T00:00:00+00:00")]
    assert lat["metricvalue"] == 150.0
    assert lat["statistic"] == "Average"


def test_latest_datapoint(spark):
    out = scrape_metrics(
        make_raw_events(spark), make_defs(spark), "hour",
        collection_time=F.lit("2026-01-02 00:00:00").cast("timestamp"),
    )
    latest = {r["id"]: r for r in latest_datapoint(out).collect()}
    inv = latest["awslambdainvocationshourfunctionnamehello_world"]
    assert inv["metrictimestamp"] == "2026-01-01T03:00:00+00:00"
    assert inv["metricvalue"] == 7.0


def test_percentile_statistic(spark):
    defs = spark.createDataFrame(
        [("App", "Latency", "hour", 3600, "p50", None, None,
          "set1", None, "dash", "1234", None, None, None)],
        METRIC_DEFS_SCHEMA,
    )
    out = scrape_metrics(
        make_raw_events(spark), defs, "hour",
        collection_time=F.lit("2026-01-02 00:00:00").cast("timestamp"),
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["metricvalue"] == 150.0  # interpolated median of 100, 200
