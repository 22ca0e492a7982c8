"""Second-account definition module — exercises the multi-account landscape
(member/streamer account 567856785678 of the same governance group as
123412341234; see definitions/accounts_config.json). Content is this
engine's own: an hourly error-rate metric with an alarm."""

from aws_dataset_ingestion_metrics_collection_framework_spark.dsl import (
    SLA,
    Dimension,
    Metadata,
    Metric,
    MetricSet,
    SLASet,
    Widget,
)

dashboard = Widget(dashboard_name="member_dashboard")

metric_set = MetricSet("member_category")
sla_set = SLASet()

error_metric = Metric(
    metric_set=metric_set,
    namespace="AWS/Lambda",
    name="Errors",
    frequency=Metric.HOUR,
    dashboard=dashboard,
    statistic="Sum",
    metadata=[Metadata(name="Team", value="member")],
    dimensions=[Dimension(name="FunctionName", value="member_fn")],
)

error_sla = SLA(
    sla_set=sla_set,
    metric=error_metric,
    threshold=5,
    comparison_operator="GREATER_THAN_THRESHOLD",
    severity="SEV 4",
    details="member error sla",
    short_description="member error sla",
    sns_enabled=True,
)
