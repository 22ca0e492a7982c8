"""Dashboard / report generation — the engine-native replacement for
CloudWatch dashboard synthesis (SURVEY §7 step 8;
ref:stacks/metrics_streamer.py:290-415).

The reference walks the in-memory definition objects and provisions one
CloudWatch dashboard per distinct ``dashboard_name`` (one GraphWidget per
metric: id ``data-gov-<unique_id()>``, title ``widget_title()``, width 10)
plus one *category* dashboard per distinct ``dashboard_category`` (one
markdown TextWidget per member dashboard, linking to it). Here the same
report derives from the ``metric_defs`` DataFrame (F5 dedup — the
``set(dashboard_name_list)`` → ``distinct()``), so it scales to any number
of definitions and emits plain JSON instead of CloudFormation.

All derivations are Column expressions (C1/C3 from functions/keys.py); the
grouping is a broadcast-size aggregation over the defs table — no big-table
shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.keys import unique_id_col, widget_title_col
from .metrics import dims_json_to_array

WIDGET_WIDTH = 10  # ref:stacks/metrics_streamer.py:357
GRAPH_WIDGET_HEIGHT = 6  # CDK GraphWidget default height (grid rows)
TEXT_WIDGET_WIDTH = 12  # ref:stacks/metrics_streamer.py:397
TEXT_WIDGET_HEIGHT = 3  # ref:stacks/metrics_streamer.py:398
GRID_WIDTH = 24  # CloudWatch dashboard grid columns


def dashboard_widgets(metric_defs: DataFrame, *, region: str = "us-east-1") -> DataFrame:
    """One row per (dashboard, metric-widget).

    Columns: ``dashboard``, ``dashboard_name`` (region-suffixed, matching the
    reference's ``f'{dashboard}-{REGION}'``), ``metric_id``
    (``data-gov-<unique_id>`` — ref:metrics_streamer.py:352), ``title``
    (``widget_title()``), ``width``.
    """
    dims = dims_json_to_array(F.col("dimensions"))
    return (
        metric_defs.filter(F.col("dashboard").isNotNull())
        .select(
            F.col("dashboard"),
            F.concat(F.col("dashboard"), F.lit("-"), F.lit(region)).alias("dashboard_name"),
            F.concat(
                F.lit("data-gov-"),
                unique_id_col(F.col("namespace"), F.col("name"), F.col("frequency"), dims),
            ).alias("metric_id"),
            widget_title_col(F.col("name"), F.col("frequency"), dims).alias("title"),
            F.lit(WIDGET_WIDTH).alias("width"),
        )
    )


def dashboard_report(metric_defs: DataFrame, *, region: str = "us-east-1") -> DataFrame:
    """One row per dashboard with its ordered widget list (the JSON report
    replacing CloudWatch Dashboard provisioning).

    Widgets sort by (metric_id, title) — the reference's order is Python
    definition-iteration order, which a distributed groupBy cannot (and
    should not) preserve; deterministic sorting is the documented divergence.
    """
    widgets = dashboard_widgets(metric_defs, region=region)
    return (
        widgets.groupBy("dashboard", "dashboard_name")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("metric_id", "title", "width"))
            ).alias("widgets"),
            F.count("*").alias("widget_count"),
        )
    )


def positioned_widgets(metric_defs: DataFrame, *, region: str = "us-east-1") -> DataFrame:
    """Widgets with the concrete CloudWatch grid geometry the reference's
    CDK synthesis produces (ref:stacks/metrics_streamer.py:340-370): each
    ``Dashboard.add_widgets(widget)`` call opens a new grid ROW, so widget i
    of a dashboard sits at ``x=0, y=i*6`` with ``width=10, height=6`` (the
    GraphWidget default height). Adds the widget's CloudWatch ``metrics``
    series — ``[namespace, name, dim1_name, dim1_value, ...]`` — built from
    ALL dimensions (the Bucket-suffix exclusion applies to id/title
    derivations only, ref:dataquality/metric.py:118-155; CwMetric passes
    every dimension, ref:cdk_constructs/cw_metric.py:41-52).

    Widget order within a dashboard is (metric_id, title) — deterministic
    where the reference relies on Python iteration order (the documented
    divergence of ``dashboard_report``). The window partitions by dashboard;
    defs tables are broadcast-size, so this never shuffles meaningful data.
    """
    dims = dims_json_to_array(F.col("dimensions"))
    # dim-less metrics: NULL dims must yield [namespace, name], not NULL
    dims_or_empty = F.coalesce(
        dims, F.array().cast("array<struct<name:string,value:string>>")
    )
    series = F.concat(
        F.array(F.col("namespace"), F.col("name")),
        F.flatten(F.transform(dims_or_empty, lambda d: F.array(d["name"], d["value"]))),
    )
    base = (
        metric_defs.filter(F.col("dashboard").isNotNull())
        .select(
            F.col("dashboard"),
            F.concat(F.col("dashboard"), F.lit("-"), F.lit(region)).alias("dashboard_name"),
            F.concat(
                F.lit("data-gov-"),
                unique_id_col(F.col("namespace"), F.col("name"), F.col("frequency"), dims),
            ).alias("metric_id"),
            widget_title_col(F.col("name"), F.col("frequency"), dims).alias("title"),
            series.alias("series"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("dashboard").orderBy("metric_id", "title")
    )
    return base.select(
        "dashboard",
        "dashboard_name",
        "metric_id",
        "title",
        "series",
        F.lit(0).alias("x"),
        ((rn - 1) * GRAPH_WIDGET_HEIGHT).alias("y"),
        F.lit(WIDGET_WIDTH).alias("width"),
        F.lit(GRAPH_WIDGET_HEIGHT).alias("height"),
    )


def dashboard_bodies(metric_defs: DataFrame, *, region: str = "us-east-1") -> DataFrame:
    """One row per dashboard with the rendered CloudWatch ``DashboardBody``
    JSON document — ``{"widgets": [{"type": "metric", x/y/width/height,
    "properties": {view/region/title/metrics}}, ...]}`` — i.e. what
    ``PutDashboard`` accepts, the relational analog of the reference's
    ``aws_cloudwatch.Dashboard`` synthesis (ref:stacks/metrics_streamer.py:362-370).

    Built entirely with Column expressions (`to_json` over collected
    structs): no driver-side loop, one broadcast-size aggregation.
    """
    w = positioned_widgets(metric_defs, region=region)
    widget_struct = F.struct(
        F.lit("metric").alias("type"),
        F.col("x"),
        F.col("y"),
        F.col("width"),
        F.col("height"),
        F.struct(
            F.lit("timeSeries").alias("view"),
            F.lit(region).alias("region"),
            F.col("title").alias("title"),
            F.array(F.col("series")).alias("metrics"),
        ).alias("properties"),
    )
    return (
        w.groupBy("dashboard", "dashboard_name")
        .agg(F.array_sort(F.collect_list(widget_struct)).alias("_widgets"))
        .select(
            "dashboard",
            "dashboard_name",
            F.to_json(F.struct(F.col("_widgets").alias("widgets"))).alias("body"),
        )
    )


def category_bodies(
    metric_defs: DataFrame,
    category_map: DataFrame | None = None,
    *,
    region: str = "us-east-1",
    account_id: str = "123456789012",
) -> DataFrame:
    """Rendered category-dashboard bodies: one markdown TextWidget (width 12,
    height 3, stacked rows) per member dashboard, with the console deep-link
    markdown of ref:stacks/metrics_streamer.py:381-399."""
    rep = category_report(metric_defs, category_map, region=region)
    full = F.concat(F.col("dashboard"), F.lit("-"), F.lit(region))
    url = F.concat(
        F.lit(f"https://{region}.console.aws.amazon.com/cloudwatch/home?region={region}"),
        F.lit("#dashboards:name="), full, F.lit(f";accountId={account_id}"),
    )
    markdown = F.concat(
        F.lit("## Navigate to **"), full, F.lit("** dashboard:\n\n"),
        F.lit("*Click here for [button:primary:"), full, F.lit("]("), url,
        F.lit(") dashboard*"),
    )
    rn = F.row_number().over(
        Window.partitionBy("dashboard_category").orderBy("dashboard")
    )
    widget = F.struct(
        F.lit("text").alias("type"),
        F.lit(0).alias("x"),
        ((rn - 1) * TEXT_WIDGET_HEIGHT).alias("y"),
        F.lit(TEXT_WIDGET_WIDTH).alias("width"),
        F.lit(TEXT_WIDGET_HEIGHT).alias("height"),
        F.struct(markdown.alias("markdown")).alias("properties"),
    )
    return (
        rep.select("dashboard_category", "category_dashboard_name", widget.alias("w"))
        .groupBy("dashboard_category", "category_dashboard_name")
        .agg(F.array_sort(F.collect_list(F.col("w"))).alias("_widgets"))
        .select(
            "dashboard_category",
            "category_dashboard_name",
            F.to_json(F.struct(F.col("_widgets").alias("widgets"))).alias("body"),
        )
    )


def category_report(
    metric_defs: DataFrame,
    category_map: DataFrame | None = None,
    *,
    region: str = "us-east-1",
) -> DataFrame:
    """Category dashboards: one row per (category, member dashboard) with the
    navigation markdown (ref:metrics_streamer.py:373-405).

    ``dashboard_category`` is not part of the §1.3 ``metric_defs`` storage
    schema (the reference's defs JSON drops it too —
    ref:definitions/definition.py:97-106); pass ``category_map`` as a
    (dashboard, dashboard_category) DataFrame from the DSL loader, or
    include a ``dashboard_category`` column on ``metric_defs`` directly.
    """
    if category_map is not None:
        defs = metric_defs.join(F.broadcast(category_map), "dashboard", "left")
    else:
        defs = metric_defs
    full_name = F.concat(F.col("dashboard"), F.lit("-"), F.lit(region))
    markdown = F.concat(
        F.lit("## Navigate to **"), full_name, F.lit("** dashboard: "),
        F.lit("[button:primary:"), full_name, F.lit("]"),
    )
    return (
        defs.filter(F.col("dashboard_category").isNotNull() & F.col("dashboard").isNotNull())
        .select("dashboard_category", "dashboard")
        .distinct()
        .select(
            "dashboard_category",
            F.concat(F.col("dashboard_category"), F.lit("-"), F.lit(region)).alias(
                "category_dashboard_name"
            ),
            "dashboard",
            markdown.alias("markdown"),
        )
    )


def write_report(report: DataFrame, path: str) -> None:
    """Persist the dashboard report as JSON (the S9-style writer)."""
    report.coalesce(1).write.mode("overwrite").json(path)
