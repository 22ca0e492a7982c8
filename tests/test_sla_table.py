"""slas-table scrape (S3/J2/F9 — ref:lambda/sla_stream_producer.py) and
lake maintenance (retention, partitioned write)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import METRIC_DEFS_SCHEMA, SLAS_SCHEMA
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.sla_table import (
    build_alarm_registry,
    scrape_sla_table,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.sources.parquet_lake import (
    apply_retention,
    write_partitioned,
)


def _alarms(spark):
    meta = spark.createDataFrame(
        [
            ("AWS/Lambda", "Invocations", "day", 86400, "Sum",
             json.dumps({"FunctionName": "hello_world"}), "123412341234",
             1.0, "LESS_THAN_OR_EQUAL_TO_THRESHOLD", "NOT_BREACHING"),
        ],
        "namespace string, name string, frequency string, period int, statistic string, "
        "dimensions string, account string, threshold double, comparison_operator string, "
        "treat_missing_data string",
    )
    return build_alarm_registry(meta).withColumn("statevalue", F.lit("ALARM")).withColumn(
        "statereason", F.lit("why")
    )


def test_alarm_registry_name_layout(spark):
    row = _alarms(spark).collect()[0]
    # C2 + cw_alarm.py:36 layout, '/' stripped, lowercase
    assert row["alarmname"] == (
        "data-gov-awslambda-invocations-day-functionname-hello_world-SLA-Alarm-us-east-1"
    )
    assert row["alarmarn"].endswith(":alarm:" + row["alarmname"])


def test_scrape_sla_table_enriches_and_filters(spark):
    defs = spark.createDataFrame(
        [("AWS/Lambda", "Invocations", "day", 86400, "Sum", '{"team": "dq"}',
          json.dumps({"FunctionName": "hello_world"}),
          "s", None, None, "123412341234", None, None, None)],
        METRIC_DEFS_SCHEMA,
    )
    out = scrape_sla_table(
        _alarms(spark), defs,
        account_id="123412341234",
        collection_time=F.lit("2026-02-03 04:00:00").cast("timestamp"),
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    # J2 metadata enrichment fired (the intended-key join)
    assert r["metadata"] == '{"team": "dq"}'
    assert r["statevalue"] == "ALARM" and r["comparisonOperator"] == "LESS_THAN_OR_EQUAL_TO_THRESHOLD"
    assert (r["year"], r["month"], r["day"], r["hour"]) == (2026, 2, 3, 4)
    assert r["collectiontime"] == "2026-02-03T04:00:00+00:00"
    # schema covers every §1.3 slas column
    assert set(SLAS_SCHEMA.fieldNames()) <= set(out.columns)


def test_scrape_keeps_unmatched_alarms_and_drops_foreign_prefix(spark):
    defs = spark.createDataFrame([], METRIC_DEFS_SCHEMA)
    alarms = _alarms(spark)
    foreign = alarms.withColumn("alarmname", F.lit("other-team-alarm"))
    out = scrape_sla_table(
        alarms.unionByName(foreign), defs, account_id="1", collection_time=F.lit("2026-01-01 00:00:00").cast("timestamp")
    )
    rows = out.collect()
    # F9 dropped the foreign alarm; unmatched data-gov alarm kept with null metadata
    assert len(rows) == 1 and rows[0]["metadata"] is None


def test_write_partitioned_and_retention(spark, tmp_path):
    df = spark.createDataFrame(
        [("us-east-1", 2026, 1, d, 0, float(d)) for d in range(1, 11)],
        "region string, year int, month int, day int, hour int, v double",
    )
    write_partitioned(df, str(tmp_path / "t"), mode="overwrite")
    back = spark.read.parquet(str(tmp_path / "t"))
    assert back.count() == 10
    kept = apply_retention(spark, str(tmp_path / "t"), max_age_days=5, today="2026-01-10")
    assert kept.count() == 6  # days 5..10 survive a 5-day retention at 2026-01-10


def test_mirror_write_to_catalog_roots(spark, tmp_path):
    """Multi-catalog fan-out (ref:lambda/add_partition.py:56-71): the same
    partitioned output lands in every catalog account's lake root —
    identical partition directory trees and identical data (parquet file
    NAMES embed job UUIDs, so identity is at the partition/data level)."""
    import os

    from aws_dataset_ingestion_metrics_collection_framework_spark.dsl.accounts import AccountRegistry
    from aws_dataset_ingestion_metrics_collection_framework_spark.sources.parquet_lake import write_partitioned_mirrored

    reg = AccountRegistry(
        config=[{"central": "999", "streamers": ["111"], "catalogs": ["555", "666"]}]
    )
    roots = reg.lake_roots("111", str(tmp_path))
    assert [os.path.basename(r) for r in roots] == ["555", "666"]

    df = spark.createDataFrame(
        [("us-east-1", 2026, 1, d % 3 + 1, 0, float(d)) for d in range(20)],
        "region string, year int, month int, day int, hour int, v double",
    )
    write_partitioned_mirrored(df, roots, mode="overwrite")

    def partition_dirs(root):
        out = set()
        for cur, _dirs, files in os.walk(root):
            if any(f.endswith(".parquet") for f in files):
                out.add(os.path.relpath(cur, root))
        return out

    assert partition_dirs(roots[0]) == partition_dirs(roots[1]) != set()
    a = sorted(tuple(r) for r in spark.read.parquet(roots[0]).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(roots[1]).collect())
    assert a == b and len(a) == 20

    import pytest

    with pytest.raises(ValueError):
        write_partitioned_mirrored(df, [])
