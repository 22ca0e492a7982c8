"""Streaming corpus-dedup ingest growth probe
(``streaming/dedup.start_corpus_dedup_ingest``): drives N micro-batches of
synthetic documents through the classify-against-all-history loop and
reports per-batch trigger duration against the accumulated history size —
the evidence that the slim (id, xxhash64) index join keeps batch cost
near-flat as the corpus grows, instead of re-paying the corpus text scan.

Batch synthesis is fully distributed (seeded hash arithmetic in Column
expressions): ``dup_frac`` of each batch's docs repeat the text of a
deterministic earlier doc (cross-batch exact dups the ingest must catch);
the rest are fresh. One parquet file per batch + maxFilesPerTrigger=1
delivers exactly one batch per trigger.

Usage: python tools/corpus_dedup_bench.py [n_batches] [batch_rows] [compact_every]
Prints a per-batch markdown table and ONE JSON summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.dedup import (
    start_corpus_dedup_ingest,
)


def _gen_text(src_col):
    """Deterministic ~15-word text as a pure Column function of a source
    id — two docs share text iff they share the source id."""
    word = lambda k: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(F.xxhash64(src_col * 31 + F.lit(k)), F.lit(997)).cast("string"),
    )
    return F.concat_ws(" ", *[word(k) for k in range(15)])


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else None
    dup_frac = 0.10

    spark = get_spark(app_name="corpus-dedup-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    root = tempfile.mkdtemp(prefix="corpus_dedup_bench_")
    src_dir, corpus, ckpt = (
        os.path.join(root, d) for d in ("in", "corpus", "ckpt")
    )
    os.makedirs(src_dir)

    # Stage one parquet file per batch. A doc is a dup when its slot hashes
    # under dup_frac AND it has history to point at (batch > 0): its source
    # is a deterministic earlier doc id; fresh docs source themselves.
    for b in range(n_batches):
        did = F.col("id") + F.lit(b * batch_rows)
        is_dup = (
            F.pmod(F.xxhash64(did * 7 + 13), F.lit(1000))
            < F.lit(int(dup_frac * 1000))
        ) & F.lit(b > 0)
        src = F.when(
            is_dup, F.pmod(F.xxhash64(did * 11 + 5), F.lit(b * batch_rows))
        ).otherwise(did)
        (
            spark.range(batch_rows)
            .select(did.alias("doc_id"), _gen_text(src).alias("text"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src_dir, f"b{b:03d}"))
        )

    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    t0 = time.perf_counter()
    q = start_corpus_dedup_ingest(
        stream, corpus, ckpt, "doc_id", "text", available_now=True,
        compact_every=compact_every,
    )
    q.awaitTermination(1800)
    wall = time.perf_counter() - t0

    log = spark.read.parquet(f"{corpus}/log")
    counts = {r["status"]: r["n"] for r in
              log.groupBy("status").agg(F.count("*").alias("n")).collect()}
    idx_rows = spark.read.parquet(f"{corpus}/index").count()
    # realized history per batch: cumulative FRESH landings (dup rows never
    # enter the index, so i*batch_rows would overstate it by the dup rate)
    fresh_by_batch = {
        r["batch"]: r["n"]
        for r in spark.read.parquet(f"{corpus}/index")
        .groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    batches = []
    hist = 0
    for i, p in enumerate(
        pr for pr in q.recentProgress if pr["numInputRows"] > 0
    ):
        batches.append(
            {
                "batch": i,
                "rows": p["numInputRows"],
                "ms": p["durationMs"]["triggerExecution"],
                "history_rows": hist,
            }
        )
        hist += fresh_by_batch.get(i, 0)

    print("| batch | history rows | batch ms |")
    print("| --- | --- | --- |")
    for b in batches:
        print(f"| {b['batch']} | {b['history_rows']} | {b['ms']} |")

    head = [b["ms"] for b in batches[1:4]]
    tail = [b["ms"] for b in batches[-3:]]
    summary = {
        "metric": "corpus_dedup_ingest",
        "compact_every": compact_every,
        "n_batches": n_batches,
        "batch_rows": batch_rows,
        "wall_s": round(wall, 1),
        "rows_per_s": round(n_batches * batch_rows / wall),
        "status_counts": counts,
        "index_rows": idx_rows,
        "head_ms_avg": round(sum(head) / len(head)),
        "tail_ms_avg": round(sum(tail) / len(tail)),
        "tail_over_head": round(sum(tail) / len(tail) / (sum(head) / len(head)), 2),
        "batches": batches,
    }
    print(json.dumps(summary))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
