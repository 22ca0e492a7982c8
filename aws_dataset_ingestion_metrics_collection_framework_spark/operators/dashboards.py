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

from pyspark.sql import DataFrame, functions as F

from ..functions.keys import unique_id_col, widget_title_col
from .metrics import dims_json_to_array

WIDGET_WIDTH = 10  # ref:stacks/metrics_streamer.py:357


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
