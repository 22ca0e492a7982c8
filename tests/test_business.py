"""Business-metric runner (A4/F7/S7) — distributed/sequential parity, the
F7 null guard, and the loud failure for cast-destroyed non-numeric scalars
(ADVICE r2: a silent NULL from CAST(non-numeric AS DOUBLE) must not be
swallowed by the F7 guard)."""

from __future__ import annotations

import pytest

from aws_dataset_ingestion_metrics_collection_framework_spark.dsl import (
    BusinessMetric,
    Dataset,
    MetricSet,
    Widget,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.business import (
    business_metrics_distributed,
    run_business_metrics,
)


def _bm(name: str, query: str, ms: MetricSet) -> BusinessMetric:
    return BusinessMetric(
        query=query,
        reference_datasets=[],
        dataset=Dataset(database="db", table="t"),
        metric_set=ms,
        namespace="Test/Business",
        name=name,
        frequency="day",
        dashboard=Widget(dashboard_name="d"),
        statistic="Sum",
    )


@pytest.fixture()
def nums(spark):
    spark.createDataFrame([(i,) for i in range(10)], "v long").createOrReplaceTempView(
        "biz_nums"
    )


def test_distributed_matches_sequential(spark, nums):
    ms = MetricSet("s")
    metrics = [
        _bm("count", "SELECT COUNT(*) FROM biz_nums", ms),
        _bm("sum", "SELECT SUM(v) FROM biz_nums", ms),
        _bm("null_scalar", "SELECT MAX(v) FROM biz_nums WHERE v > 100", ms),
    ]
    for mode in ("distributed", "sequential"):
        rows = {r["name"]: r["value"] for r in run_business_metrics(spark, metrics, mode=mode).collect()}
        # F7: the genuinely-NULL scalar is skipped, numerics published
        assert rows == {"count": 10.0, "sum": 45.0}


def test_distributed_raises_on_non_numeric_scalar(spark, nums):
    ms = MetricSet("s")
    metrics = [_bm("bad", "SELECT 'not a number'", ms)]
    with pytest.raises(Exception, match="non-numeric|CAST|cast"):
        run_business_metrics(spark, metrics, mode="distributed")


def test_distributed_union_emits_raw_null_flag(spark, nums):
    out = business_metrics_distributed(
        spark,
        {"a": "SELECT COUNT(*) FROM biz_nums", "b": "SELECT NULL"},
    ).collect()
    by = {r["name"]: r for r in out}
    assert by["a"]["value"] == 10.0 and by["a"]["raw_null"] is False
    assert by["b"]["value"] is None and by["b"]["raw_null"] is True
