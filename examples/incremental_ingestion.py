"""Incremental-ingestion lifecycle — a 'day two' of a living lake, the
round-5b operators chained the way continuous ingestion actually runs:

  day-1 corpus lands (normalized, mixed to the language target, rollup
  state + snapshot materialized) → day-2 batch arrives → bookmark tells
  us what's new → unicode-normalize → incremental dedup vs the ACCUMULATED
  corpus (exact + near, never re-pairing corpus×corpus) → only fresh docs
  append → rollup state advances by MERGE (O(increment), equality with a
  full recompute asserted) → CDC snapshot diff audits what the day changed
  → deterministic per-group sample drawn for eval.

Every stage is a declared operator from plans/queries.py — the composition
story for continuous ingestion, not new code paths.

Usage: python examples/incremental_ingestion.py [out_dir] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import cdc as CDC
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import curation as CU
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import dedup as D
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import rollup as RU
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import textops as TX


def main(out_dir: str, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark(app_name="incremental-ingestion")
    spark.sparkContext.setLogLevel("ERROR")
    summary: dict = {}

    docs = TX.normalize_unicode(
        load_table(spark, sf_dir, "documents"), ["text"]
    )
    events = load_table(spark, sf_dir, "events")

    # ---- day 1: corpus lands, mixed to the language target -------------
    day1 = docs.filter(F.col("doc_id") % 3 != 0)
    mixed = CU.mix_corpus(
        day1, "doc_id", "lang", "n_chars",
        {"en": 600_000, "zh": 150_000, "fr": 100_000, "es": 100_000,
         "de": 50_000},
    )
    corpus_path = os.path.join(out_dir, "corpus")
    mixed.drop("rate_ppm").write.mode("overwrite").parquet(corpus_path)
    summary["day1_docs"] = spark.read.parquet(corpus_path).count()

    # rollup state from day-1 events (ts < Jan 15)
    ev1 = events.filter(F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
    state = RU.rollup_partials(ev1, ["event_type"], "ts", "value")

    # ---- day 2: a new batch arrives ------------------------------------
    day2 = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = spark.read.parquet(corpus_path)
    classified = D.incremental_dedup(day2, corpus, "doc_id", "text")
    fresh_ids = classified.filter(F.col("status") == "fresh").select("doc_id")
    appended = day2.join(fresh_ids, "doc_id", "left_semi")
    appended.write.mode("append").parquet(corpus_path)
    counts = {r["status"]: r["n"] for r in classified.groupBy("status")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    summary["day2_exact_dup"] = counts.get("exact_dup", 0)
    summary["day2_near_dup"] = counts.get("near_dup", 0)
    summary["day2_fresh"] = counts.get("fresh", 0)

    # rollup advances by MERGE — and must equal the full recompute
    ev2 = events.filter(F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
    state = RU.merge_rollup(state, RU.rollup_partials(ev2, ["event_type"], "ts", "value"))
    merged = sorted(tuple(r) for r in RU.finalize_rollup(state).collect())
    full = sorted(
        tuple(r)
        for r in RU.finalize_rollup(
            RU.rollup_partials(events, ["event_type"], "ts", "value")
        ).collect()
    )
    assert merged == full, "incremental rollup diverged from recompute"
    summary["rollup_rows"] = len(merged)

    # ---- audit: what did day 2 change in the user snapshot? -------------
    tomb = F.col("event_type") == "error"
    snap1 = CDC.upsert_latest(ev1, ["user_id"], ["ts", "event_id"], delete_predicate=tomb)
    snap2 = CDC.upsert_latest(events, ["user_id"], ["ts", "event_id"], delete_predicate=tomb)
    diff = CDC.table_diff(snap1, snap2, ["user_id"], ["event_type", "value"])
    summary["snapshot_changes"] = diff.count()

    # ---- eval draw: deterministic k-per-language sample ------------------
    sample = CU.group_sample(
        spark.read.parquet(corpus_path), "doc_id", ["lang"], 5
    )
    summary["eval_sample"] = sample.count()

    out = os.path.join(out_dir, "summary.json")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(summary, fh, indent=2)
    return summary


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/incremental_ingestion"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    print(json.dumps(main(out, sf), indent=2))
