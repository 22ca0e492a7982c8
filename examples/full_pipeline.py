"""End-to-end batch lifecycle — everything a user of the reference runs,
on the engine (SURVEY §3.1-§3.3 + dashboards), in one script:

  definitions DSL → business metrics (SQL scalars → metric_datapoints)
  → statistic engine (windowed stats + enrichment → metrics_day lake)
  → SLA evaluation (gap-fill, m-of-n, state machine → transitions → alerts)
  → slas-table scrape → dashboard report.

Usage: python examples/full_pipeline.py [out_dir] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import METRIC_DEFS_SCHEMA, load_table, register_tables
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import dashboards as DB
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import metrics as M
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import sla_eval as SLA
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import sla_table as ST
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.business import business_metrics_distributed
from aws_dataset_ingestion_metrics_collection_framework_spark.sources.parquet_lake import read_lake_table, write_partitioned

ACCOUNT = "123412341234"
EVENT_TYPES = ["click", "view", "purchase", "error", "signup"]


def main(out_dir: str, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark(app_name="full-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, sf_dir)
    summary: dict = {}

    # 1 — business metrics (§3.1): SQL scalars → metric_datapoints rows
    scalars = business_metrics_distributed(
        spark,
        {
            "lineitem_count": "SELECT COUNT(*) FROM lineitem",
            "open_orders": "SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O'",
        },
    )
    summary["business_scalars"] = {r["name"]: r["value"] for r in scalars.collect()}

    # 2 — statistic engine (§3.2): events → windowed stats → metrics_day lake
    raw = load_table(spark, sf_dir, "events").select(
        F.lit("App/Events").alias("namespace"),
        F.col("event_type").alias("name"),
        F.lit(None).cast("string").alias("dimensions"),
        "ts",
        "value",
    )
    defs = spark.createDataFrame(
        [("App/Events", et, "day", 86400, "Sum", None, None,
          "events", None, "ops_dash", ACCOUNT, None, None, None)
         for et in EVENT_TYPES],
        METRIC_DEFS_SCHEMA,
    )
    metrics = M.scrape_metrics(raw, defs, "day", account_id=ACCOUNT)
    lake = os.path.join(out_dir, "metrics_day")
    write_partitioned(metrics, lake, mode="overwrite")
    summary["metrics_day_rows"] = read_lake_table(spark, lake).count()

    # 3 — SLA evaluation (§3.3): m-of-n over the scraped series
    series = read_lake_table(spark, lake).select(
        F.col("id").alias("series_id"),
        F.to_timestamp("metrictimestamp").alias("ws"),
        F.col("metricvalue").cast("double").alias("value"),
    )
    slas = spark.createDataFrame(
        [(f"sla_{et}", f"appevents{et}day", 50.0, "GREATER_THAN_THRESHOLD",
          1, 1, "NOT_BREACHING", 86400) for et in EVENT_TYPES],
        "sla_id string, series_id string, threshold double, comparison_operator string, "
        "datapoints_to_alarm int, evaluation_periods int, treat_missing_data string, period int",
    )
    evaluated = SLA.evaluate_slas(series, slas)
    transitions = SLA.state_transitions(evaluated)
    meta = spark.createDataFrame(
        [(f"sla_{et}", f"{et} volume", f"{et} moved", "SEV 3", True, et, "day", "", "ref-1")
         for et in EVENT_TYPES],
        "sla_id string, details string, short_description string, severity string, "
        "sns_enabled boolean, metric_name string, frequency string, "
        "dimension_value string, reference_id string",
    )
    alerts = SLA.build_alerts(transitions, meta)
    summary["sla_states"] = {
        r["statevalue"]: r["count"]
        for r in evaluated.groupBy("statevalue").count().collect()
    }
    summary["alerts"] = alerts.count()

    # 4 — slas table scrape
    latest = evaluated.groupBy("sla_id").agg(
        F.max_by("statevalue", "ws").alias("statevalue"), F.max("ws").alias("ws")
    )
    sla_meta = defs.select(
        "namespace", "name", "frequency", "period", "statistic", "dimensions", "account",
        F.lit(50.0).alias("threshold"),
        F.lit("GREATER_THAN_THRESHOLD").alias("comparison_operator"),
        F.lit("NOT_BREACHING").alias("treat_missing_data"),
        F.concat(F.lit("sla_"), F.col("name")).alias("sla_id"),
    )
    alarms = ST.build_alarm_registry(sla_meta).join(latest, "sla_id").withColumn(
        "statereason", F.concat(F.lit("state is "), F.col("statevalue"))
    )
    slas_rows = ST.scrape_sla_table(alarms, defs, account_id=ACCOUNT)
    slas_lake = os.path.join(out_dir, "slas")
    write_partitioned(slas_rows, slas_lake, mode="overwrite")
    summary["slas_rows"] = read_lake_table(spark, slas_lake).count()

    # 5 — dashboard report
    report = DB.dashboard_report(defs)
    DB.write_report(report, os.path.join(out_dir, "dashboards"))
    summary["dashboards"] = report.count()
    return summary


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine_pipeline_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    print(json.dumps(main(out, sf), indent=2, default=str))
