"""Canonical example definition module (the smoke fixture — mirrors the
values of the reference's example, ref:definitions/account_123412341234/set1.py,
which FIXTURES.md designates as the golden row)."""

from aws_dataset_ingestion_metrics_collection_framework_spark.dsl import (
    SLA,
    Dimension,
    Metadata,
    Metric,
    MetricSet,
    SLASet,
    Widget,
)

dashboard = Widget(dashboard_name="test_dashboard_category")

metric_set = MetricSet("test_category")
sla_set = SLASet()

test_metric = Metric(
    metric_set=metric_set,
    namespace="AWS/Lambda",
    name="Invocations",
    frequency=Metric.DAY,
    dashboard=dashboard,
    statistic="Sum",
    metadata=[Metadata(name="Thing", value="foobar")],
    dimensions=[Dimension(name="FunctionName", value="hello_world")],
)

test_sla = SLA(
    sla_set=sla_set,
    metric=test_metric,
    threshold=1,
    comparison_operator="LESS_THAN_OR_EQUAL_TO_THRESHOLD",
    severity="SEV 5",
    details="test_sla",
    short_description="test_sla",
    sns_enabled=True,
)
