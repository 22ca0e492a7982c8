"""Dashboard/report generation (SURVEY §7 step 8 —
ref:stacks/metrics_streamer.py:290-415 semantics over metric_defs)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import METRIC_DEFS_SCHEMA
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dashboards import (
    category_bodies,
    category_report,
    dashboard_bodies,
    dashboard_report,
    dashboard_widgets,
    positioned_widgets,
)


def defs_df(spark):
    rows = [
        ("AWS/Lambda", "Invocations", "day", 86400, "Sum", None,
         json.dumps({"FunctionName": "hello_world", "LogBucket": "skipme"}),
         "s", None, "dash_a", "1", None, None, None),
        ("AWS/Lambda", "Errors", "hour", 3600, "Sum", None, None,
         "s", None, "dash_a", "1", None, None, None),
        ("App", "rows", "day", 86400, "Sum", None, None,
         "s", None, "dash_b", "1", None, None, None),
        ("App", "hidden", "day", 86400, "Sum", None, None,
         "s", None, None, "1", None, None, None),  # no dashboard → excluded
    ]
    return spark.createDataFrame(rows, METRIC_DEFS_SCHEMA)


def test_widget_derivations_match_reference_semantics(spark):
    w = {r["metric_id"]: r for r in dashboard_widgets(defs_df(spark)).collect()}
    # C1 unique_id: \W+ stripped, lowercase; Bucket-suffixed dim excluded (F6)
    assert "data-gov-awslambdainvocationsdayfunctionnamehello_world" in w
    row = w["data-gov-awslambdainvocationsdayfunctionnamehello_world"]
    # C3 widget_title: '/' removed, lowercase, dim *values* only
    assert row["title"] == "invocations per day-hello_world"
    assert row["dashboard_name"] == "dash_a-us-east-1"
    assert row["width"] == 10
    # dim-less metric
    assert w["data-gov-awslambdaerrorshour"]["title"] == "errors per hour-"
    # the no-dashboard metric is excluded
    assert len(w) == 3


def test_dashboard_report_groups_and_sorts(spark):
    rep = {r["dashboard"]: r for r in dashboard_report(defs_df(spark)).collect()}
    assert set(rep) == {"dash_a", "dash_b"}
    assert rep["dash_a"]["widget_count"] == 2
    ids = [x["metric_id"] for x in rep["dash_a"]["widgets"]]
    assert ids == sorted(ids)


def test_category_report_dedups_dashboards(spark):
    cats = spark.createDataFrame(
        [("dash_a", "cat1"), ("dash_b", "cat1")], "dashboard string, dashboard_category string"
    )
    rows = category_report(defs_df(spark), cats).orderBy("dashboard").collect()
    # one row per distinct (category, dashboard) — dash_a has 2 metrics but 1 row
    assert [(r["dashboard_category"], r["dashboard"]) for r in rows] == [
        ("cat1", "dash_a"), ("cat1", "dash_b"),
    ]
    assert rows[0]["category_dashboard_name"] == "cat1-us-east-1"
    assert "dash_a-us-east-1" in rows[0]["markdown"]


def test_positioned_widgets_grid_geometry(spark):
    """CDK layout semantics: one add_widgets call per widget ⇒ one grid row
    each — x=0, y=i*6, width=10, height=6; series carries ALL dims (the
    Bucket exclusion is an id/title rule only)."""
    rows = positioned_widgets(defs_df(spark)).orderBy("dashboard", "y").collect()
    by_dash = {}
    for r in rows:
        by_dash.setdefault(r["dashboard"], []).append(r)
    assert [(r["x"], r["y"], r["width"], r["height"]) for r in by_dash["dash_a"]] == [
        (0, 0, 10, 6), (0, 6, 10, 6),
    ]
    assert [(r["x"], r["y"]) for r in by_dash["dash_b"]] == [(0, 0)]
    inv = next(r for r in rows if "invocations" in r["metric_id"])
    # all dims in the series path — including the Bucket-suffixed one
    assert inv["series"] == [
        "AWS/Lambda", "Invocations", "FunctionName", "hello_world", "LogBucket", "skipme",
    ]


def test_dashboard_body_golden_json(spark):
    """The rendered PutDashboard DashboardBody for dash_b, byte-for-byte."""
    bodies = {r["dashboard"]: r["body"] for r in dashboard_bodies(defs_df(spark)).collect()}
    assert set(bodies) == {"dash_a", "dash_b"}
    assert json.loads(bodies["dash_b"]) == {
        "widgets": [
            {
                "type": "metric",
                "x": 0,
                "y": 0,
                "width": 10,
                "height": 6,
                "properties": {
                    "view": "timeSeries",
                    "region": "us-east-1",
                    "title": "rows per day-",
                    "metrics": [["App", "rows"]],
                },
            }
        ]
    }
    dash_a = json.loads(bodies["dash_a"])
    assert [w["y"] for w in dash_a["widgets"]] == [0, 6]
    assert all(w["type"] == "metric" and w["width"] == 10 for w in dash_a["widgets"])


def test_category_body_golden_json(spark):
    cats = spark.createDataFrame(
        [("dash_a", "cat1"), ("dash_b", "cat1")], "dashboard string, dashboard_category string"
    )
    out = category_bodies(defs_df(spark), cats, account_id="123412341234").collect()
    assert len(out) == 1 and out[0]["category_dashboard_name"] == "cat1-us-east-1"
    body = json.loads(out[0]["body"])
    # one TextWidget per member dashboard, stacked 3-high rows, width 12
    assert [(w["type"], w["x"], w["y"], w["width"], w["height"]) for w in body["widgets"]] == [
        ("text", 0, 0, 12, 3), ("text", 0, 3, 12, 3),
    ]
    md = body["widgets"][0]["properties"]["markdown"]
    assert md.startswith("## Navigate to **dash_a-us-east-1** dashboard:")
    assert (
        "[button:primary:dash_a-us-east-1]"
        "(https://us-east-1.console.aws.amazon.com/cloudwatch/home?region=us-east-1"
        "#dashboards:name=dash_a-us-east-1;accountId=123412341234) dashboard*" in md
    )


def test_dashboard_category_map_from_dsl(spark):
    import os
    from aws_dataset_ingestion_metrics_collection_framework_spark.dsl.loader import DefinitionSet, dashboard_category_map

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "definitions")
    ds = DefinitionSet(accounts=["123412341234"], root=root)
    cmap = {r["dashboard"]: r["dashboard_category"] for r in dashboard_category_map(spark, ds).collect()}
    # the example definition declares one widget (see definitions/account_*/)
    assert len(cmap) >= 1
