"""Streaming throughput measurement: the §3.2→§3.3 topology
(streaming_scrape → metrics lake → streaming SLA machine) driven by the
sf0.1 events table split into micro-batches.

Methodology: the raw events (100k rows at sf0.1) are staged as N parquet
chunk files; a file-source stream with maxFilesPerTrigger=1 delivers one
chunk per micro-batch, so each trigger processes ~rows/N events. Per-batch
metrics come from StreamingQuery.recentProgress — numInputRows,
triggerExecution ms, and stateOperators rows/memory (the open-window +
alarm-ring-buffer state the watermark bounds).

Usage: python tools/stream_bench.py [sf_dir] [n_chunks]
Prints a per-stage markdown table and ONE JSON summary line (the SCALE.md
streaming section is generated from this).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import (
    METRIC_DEFS_SCHEMA,
    load_table,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming import (
    streaming_scrape,
    streaming_sla_pipeline,
)

EVENT_TYPES = ["click", "view", "purchase", "error", "signup"]


def _progress_stats(query) -> list[dict]:
    out = []
    for p in query.recentProgress:
        if p["numInputRows"] == 0:
            continue
        state = p.get("stateOperators") or []
        out.append(
            {
                "rows": p["numInputRows"],
                "batch_ms": p["durationMs"].get("triggerExecution"),
                "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
                "state_mb": round(
                    sum(s.get("memoryUsedBytes", 0) for s in state) / 1e6, 2
                ),
            }
        )
    return out


def _summarize(name: str, batches: list[dict]) -> dict:
    rows = sum(b["rows"] for b in batches)
    ms = [b["batch_ms"] for b in batches if b["batch_ms"]]
    return {
        "stage": name,
        "batches": len(batches),
        "rows": rows,
        "mean_batch_ms": round(sum(ms) / max(len(ms), 1)),
        "max_batch_ms": max(ms, default=0),
        "rows_per_sec": round(rows / (sum(ms) / 1000.0)) if ms else None,
        "final_state_rows": batches[-1]["state_rows"] if batches else 0,
        "final_state_mb": batches[-1]["state_mb"] if batches else 0,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        # stage raw events as N chunk files (raw_events shape, FIXTURES §1)
        raw = load_table(spark, sf_dir, "events").select(
            F.lit("App/Events").alias("namespace"),
            F.col("event_type").alias("name"),
            F.lit(None).cast("string").alias("dimensions"),
            # watermarks require an instant (TIMESTAMP), not NTZ; session
            # is pinned UTC so the cast is exact
            F.col("ts").cast("timestamp").alias("ts"),
            "value",
        )
        src = os.path.join(work, "chunks")
        raw.repartition(n_chunks).write.parquet(src)
        raw_schema = spark.read.parquet(src).schema

        defs = spark.createDataFrame(
            [
                ("App/Events", t, "minute", 60, "Sum", None, "{}",
                 "events", None, None, "1", None, None, None)
                for t in EVENT_TYPES
            ],
            METRIC_DEFS_SCHEMA,
        )

        # ---- §3.2 scrape: windowed stats + enrichment → metrics lake
        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        metrics = streaming_scrape(
            stream, defs, "minute", period_seconds=60,
            watermark_delay="10 minutes",
            collection_time=F.lit("2026-01-01 00:00:00").cast("timestamp"),
        )
        lake = os.path.join(work, "mlake")
        q1 = (
            metrics.writeStream.format("parquet")
            .option("path", lake)
            .option("checkpointLocation", os.path.join(work, "ck1"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q1.awaitTermination(600)
        scrape = _summarize("scrape(3.2)", _progress_stats(q1))

        # ---- §3.3 SLA machine over the published lake
        lake_df = spark.read.parquet(lake)
        slas = (
            lake_df.select("id").distinct()
            .select(
                F.concat(F.lit("sla_"), "id").alias("sla_id"),
                F.col("id").alias("series_id"),
                F.lit(250.0).alias("threshold"),
                F.lit("GREATER_THAN_THRESHOLD").alias("comparison_operator"),
                F.lit(2).alias("datapoints_to_alarm"),
                F.lit(3).alias("evaluation_periods"),
                F.lit("NOT_BREACHING").alias("treat_missing_data"),
                F.lit(60).alias("period"),
            )
        )
        mstream = (
            spark.readStream.schema(lake_df.schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(lake)
        )
        out = streaming_sla_pipeline(mstream, slas)
        q2 = (
            out.writeStream.format("parquet")
            .option("path", os.path.join(work, "states"))
            .option("checkpointLocation", os.path.join(work, "ck2"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(600)
        sla = _summarize("sla(3.3)", _progress_stats(q2))

        for s in (scrape, sla):
            print(
                f"| {s['stage']} | {s['batches']} | {s['rows']} | "
                f"{s['mean_batch_ms']} | {s['max_batch_ms']} | "
                f"{s['rows_per_sec']} | {s['final_state_rows']} | "
                f"{s['final_state_mb']} |",
                file=sys.stderr,
            )
        print(json.dumps({"sf_dir": sf_dir, "n_chunks": n_chunks,
                          "stages": [scrape, sla]}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
