"""DSL golden tests — derived keys must be byte-compatible with the
reference's Python derivations (values computed by hand from
ref:dataquality/metric.py:118-155 over the canonical example fixture)."""

import json
import os

from aws_dataset_ingestion_metrics_collection_framework_spark.dsl import (
    SLA,
    BusinessMetric,
    Dataset,
    Definition,
    DefinitionSet,
    Dimension,
    Metadata,
    Metric,
    MetricSet,
    MetricStream,
    SLASet,
    Widget,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFS_ROOT = os.path.join(REPO, "definitions")


def make_example_metric():
    ms = MetricSet("test_category")
    return Metric(
        metric_set=ms,
        namespace="AWS/Lambda",
        name="Invocations",
        frequency=Metric.DAY,
        dashboard=Widget(dashboard_name="test_dashboard_category"),
        statistic="Sum",
        metadata=[Metadata(name="Thing", value="foobar")],
        dimensions=[Dimension(name="FunctionName", value="hello_world")],
    )


def test_unique_id_golden():
    m = make_example_metric()
    # 'AWS/Lambda'+'Invocations'+'day'+'FunctionName'+'hello_world',
    # \W+ stripped (underscore survives — \w includes it), lowercased
    assert m.unique_id() == "awslambdainvocationsdayfunctionnamehello_world"


def test_alarm_unique_id_golden():
    m = make_example_metric()
    assert m.alarm_unique_id() == "awslambda-invocations-day-functionname-hello_world-"


def test_widget_title_golden():
    m = make_example_metric()
    assert m.widget_title() == "invocations per day-hello_world"


def test_alarm_name_golden():
    m = make_example_metric()
    sla_set = SLASet()
    sla = SLA(
        sla_set=sla_set,
        metric=m,
        threshold=1,
        comparison_operator="LESS_THAN_OR_EQUAL_TO_THRESHOLD",
        severity="SEV 5",
        details="d",
        short_description="s",
    )
    assert (
        sla.alarm_name("us-east-1")
        == "data-gov-awslambda-invocations-day-functionname-hello_world-SLA-Alarm-us-east-1"
    )


def test_bucket_dimension_excluded():
    ms = MetricSet("s")
    m = Metric(
        metric_set=ms,
        namespace="NS",
        name="N",
        frequency="hour",
        dashboard=Widget(dashboard_name="d"),
        statistic="Average",
        dimensions=[Dimension("SomeBucket", "b"), Dimension("Fn", "f")],
    )
    assert m.unique_id() == "nsnhourfnf"
    assert m.alarm_unique_id() == "ns-n-hour-fn-f-"
    assert m.widget_title() == "n per hour-f"


def test_frequency_to_period():
    assert Metric.frequency_to_period("day") == 86400
    assert Metric.frequency_to_period("hour") == 3600
    assert Metric.frequency_to_period("minute") == 60


def test_metric_registers_in_set():
    ms = MetricSet("s")
    m = make_metric(ms)
    assert ms.metrics == (m,)


def make_metric(ms, **kw):
    args = dict(
        metric_set=ms,
        namespace="NS",
        name="N",
        frequency="hour",
        dashboard=Widget(dashboard_name="d"),
        statistic="Sum",
    )
    args.update(kw)
    return Metric(**args)


def test_metric_stream_frequency_filter():
    ms = MetricSet("s")
    m1 = make_metric(ms, name="A", frequency="hour")
    make_metric(ms, name="B", frequency="day")
    stream = MetricStream([ms])
    queries = stream.metric_data_queries("hour")
    assert len(queries) == 1
    assert queries[0]["Id"] == m1.unique_id()
    assert queries[0]["MetricStat"]["Period"] == 3600
    assert queries[0]["MetricStat"]["Stat"] == "Sum"
    assert queries[0]["MetricStat"]["Metric"]["Namespace"] == "NS"


def test_definition_loader():
    d = Definition(account="123412341234", root=DEFS_ROOT)
    assert len(d.metric_sets) == 1
    assert len(d.sla_sets) == 1
    assert d.metric_sets[0].name == "test_category"
    assert len(d.metric_sets[0].metrics) == 1


def test_definition_set_flattening():
    ds = DefinitionSet(accounts=["123412341234"], root=DEFS_ROOT)
    assert len(ds.metric_sets) == 1
    row = ds.metric_sets[0]
    assert row["namespace"] == "AWS/Lambda"
    assert row["name"] == "Invocations"
    assert row["frequency"] == "day"
    assert row["period"] == 86400
    assert row["statistic"] == "Sum"
    assert json.loads(row["metadata"]) == {"Thing": "foobar"}
    assert json.loads(row["dimensions"]) == {"FunctionName": "hello_world"}
    assert row["metric_set"] == "test_category"
    assert row["dashboard"] == "test_dashboard_category"
    assert row["account"] == "123412341234"
    sla_row = ds.sla_sets[0]
    assert sla_row["threshold"] == 1
    assert sla_row["comparison_operator"] == "LESS_THAN_OR_EQUAL_TO_THRESHOLD"
    assert sla_row["datapoints_to_alarm"] == 1
    assert sla_row["evaluation_periods"] == 1
    assert sla_row["treat_missing_data"] == "NOT_BREACHING"
    assert sla_row["metric_namespace"] == "AWS/Lambda"
    assert json.loads(sla_row["metric_dimensions"]) == {"FunctionName": "hello_world"}


def test_flattening_is_side_effect_free():
    # divergence from reference: flattening must not mutate the DSL objects
    DefinitionSet(accounts=["123412341234"], root=DEFS_ROOT)
    d = Definition(account="123412341234", root=DEFS_ROOT)
    m = d.metric_sets[0].metrics[0]
    assert isinstance(m.metadata, list)  # still Metadata objects, not JSON str
    assert m.metadata[0].name == "Thing"


def test_business_metric():
    ms = MetricSet("bm")
    bm = BusinessMetric(
        query="SELECT count(*) FROM lineitem",
        reference_datasets=[Dataset(database="db", table="lineitem")],
        dataset=Dataset(database="db", table="lineitem"),
        metric_set=ms,
        namespace="DataGov/Business",
        name="RowCount",
        frequency="day",
        dashboard=Widget(dashboard_name="d"),
        statistic="Sum",
    )
    assert bm.query == "SELECT count(*) FROM lineitem"
    assert bm.reference_datasets[0].alias == "lineitem"
    ds = DefinitionSet.__new__(DefinitionSet)
    row = DefinitionSet._flatten_metric(bm, "1234")
    assert row["query"] == "SELECT count(*) FROM lineitem"
    assert json.loads(row["dataset"])["table"] == "lineitem"


def test_account_registry():
    from aws_dataset_ingestion_metrics_collection_framework_spark.dsl.accounts import AccountRegistry

    cfg = [
        {"central": "c1", "streamers": ["a1", "a2"], "catalogs": ["a1"]},
        {"central": "c2", "streamers": ["b1"], "catalogs": ["b1", "b9"]},
    ]
    reg = AccountRegistry(config=cfg)
    # reference-API lookups (ref:accounts/accounts.py semantics)
    assert reg.fetch_account_central("a2") == "c1"
    assert reg.fetch_account_central("b1") == "c2"
    assert reg.fetch_account_central("zz") is None
    assert reg.fetch_account_streamers("a1") == ["a1", "a2"]
    assert reg.fetch_account_catalogs("b1") == ["b1", "b9"]
    assert reg.all_streamers() == ["a1", "a2", "b1"]


def test_multi_account_flattening(spark):
    import os
    from aws_dataset_ingestion_metrics_collection_framework_spark.dsl.accounts import AccountRegistry
    from aws_dataset_ingestion_metrics_collection_framework_spark.dsl.loader import (
        DefinitionSet,
        definitions_to_dataframes,
    )

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "definitions")
    reg = AccountRegistry(path=os.path.join(root, "accounts_config.json"))
    ds = DefinitionSet(accounts=reg.all_streamers(), root=root)
    defs, slas = definitions_to_dataframes(spark, ds)
    accounts = {r["account"] for r in defs.select("account").distinct().collect()}
    assert accounts == {"123412341234", "567856785678"}
    assert {r["account"] for r in slas.select("account").distinct().collect()} == accounts
