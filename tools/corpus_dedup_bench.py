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

Usage: python tools/corpus_dedup_bench.py [n_batches] [batch_rows] [compact_every] [max_fold_rows] [bucket_target]
Prints a per-batch markdown table and ONE JSON summary line.

Decades mode — the flat-probe-vs-history-decades evidence:

    python tools/corpus_dedup_bench.py decades [hist1 hist2 ...] \
        [--batch-rows N] [--probe-batches N] [--bucket-target N] [--flat] \
        [--compact-every N]

For each history size H: seed a corpus of H docs directly (data/batch=*
dirs + a committed hash-bucketed index tree — readable as a legacy base
run), then stream probe batches over it via ``first_batch_id`` and
report per-batch trigger ms. ``--flat`` seeds a single-bucket tree
(bucket_target_rows=H) — the A/B baseline whose probe cost grows
linearly with H. ``--compact-every N`` also folds every N probe batches
and reports FOLD wall ms per fold — the evidence that the tiered-LSM
fold cost is a function of the probe window, not of H (the old
single-tree fold rewrote all H rows every cycle).
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


def _seed_history(spark, corpus: str, hist_rows: int, per_batch: int,
                  bucket_target: int) -> int:
    """Materialize an imported corpus of ``hist_rows`` docs: data/batch=*
    (id-sorted files) + one committed bucketed compact tree — byte-wise
    the layout a compact_every fold leaves behind. Returns the batch
    count K (= the stream's first_batch_id)."""
    k = max(1, -(-hist_rows // per_batch))
    docs = spark.range(hist_rows).select(
        F.col("id").alias("doc_id"),
        _gen_text(F.col("id")).alias("text"),
        (F.col("id") / per_batch).cast("int").alias("batch"),
    )
    (
        docs.repartition(k, "batch")
        .sortWithinPartitions("doc_id")
        .write.partitionBy("batch")
        .mode("overwrite")
        .parquet(f"{corpus}/data")
    )
    nb = max(1, -(-hist_rows // bucket_target))
    idx = docs.select(
        "doc_id", F.xxhash64("text").alias("_h"), "batch"
    ).withColumn("bucket", F.pmod(F.col("_h"), F.lit(nb)).cast("int"))
    tree = f"{corpus}/index_compact/upto={k}"
    (
        idx.repartition(nb, "bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(tree)
    )
    with open(f"{tree}/_nb", "w") as fh:
        fh.write(str(nb))
    return k


def decades() -> None:
    rest = sys.argv[2:]
    flat = "--flat" in rest
    opts = {"--batch-rows": 2_000, "--probe-batches": 8,
            "--bucket-target": 50_000, "--compact-every": 0}
    positional = []
    i = 0
    while i < len(rest):
        if rest[i] in opts:
            opts[rest[i]] = int(rest[i + 1])
            i += 2
        elif rest[i] == "--flat":
            i += 1
        else:
            positional.append(int(rest[i]))
            i += 1
    hists = positional or [40_000, 400_000, 4_000_000]
    batch_rows = opts["--batch-rows"]
    n_probe = opts["--probe-batches"]
    bucket_target = opts["--bucket-target"]
    compact_every = opts["--compact-every"] or None
    seed_per_batch = 40_000
    dup_frac = 0.10

    spark = get_spark(app_name="corpus-dedup-decades")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    results = []
    for hist in hists:
        root = tempfile.mkdtemp(prefix="corpus_dedup_decades_")
        src_dir, corpus, ckpt = (
            os.path.join(root, d) for d in ("in", "corpus", "ckpt")
        )
        os.makedirs(src_dir)
        target = hist if flat else bucket_target
        k = _seed_history(spark, corpus, hist, seed_per_batch, target)

        for b in range(n_probe):
            did = F.col("id") + F.lit(hist + b * batch_rows)
            is_dup = (
                F.pmod(F.xxhash64(did * 7 + 13), F.lit(1000))
                < F.lit(int(dup_frac * 1000))
            )
            src = F.when(
                is_dup, F.pmod(F.xxhash64(did * 11 + 5), F.lit(hist))
            ).otherwise(did)
            (
                spark.range(batch_rows)
                .select(did.alias("doc_id"), _gen_text(src).alias("text"))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(src_dir, f"b{b:03d}"))
            )

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
        )
        fold_metrics: dict = {}
        q = start_corpus_dedup_ingest(
            stream, corpus, ckpt, "doc_id", "text", available_now=True,
            bucket_target_rows=target, first_batch_id=k,
            compact_every=compact_every, metrics=fold_metrics,
        )
        q.awaitTermination(1800)
        ms = [
            p["durationMs"]["triggerExecution"]
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        dups = spark.read.parquet(f"{corpus}/log").filter(
            "status = 'exact_dup'"
        ).count()
        warm = ms[1:] or ms  # batch 0 pays session/stream warmup
        folds = fold_metrics.get("fold", [])
        entry = {
            "history_rows": hist,
            "n_buckets": max(1, -(-hist // target)),
            "probe_batches": len(ms),
            "batch_ms_warm_avg": round(sum(warm) / len(warm)),
            "batch_ms": ms,
            "exact_dups_found": dups,
        }
        if folds:
            entry["fold_ms_avg"] = round(
                sum(f["ms"] for f in folds) / len(folds)
            )
            entry["fold_ms_max"] = max(f["ms"] for f in folds)
            entry["folds"] = folds
        results.append(entry)
        shutil.rmtree(root, ignore_errors=True)

    cols = "| history rows | buckets | warm avg batch ms | dups found |"
    if compact_every:
        cols = cols[:-1] + " fold ms avg | fold ms max |"
    print(cols)
    print("| --- | --- | --- | --- |" + (" --- | --- |" if compact_every else ""))
    for r in results:
        line = (
            f"| {r['history_rows']} | {r['n_buckets']} | "
            f"{r['batch_ms_warm_avg']} | {r['exact_dups_found']} |"
        )
        if compact_every:
            line += f" {r.get('fold_ms_avg', '-')} | {r.get('fold_ms_max', '-')} |"
        print(line)
    first, last = results[0], results[-1]
    summary = {
        "metric": "corpus_dedup_probe_decades",
        "mode": "flat" if flat else "bucketed",
        "batch_rows": batch_rows,
        "bucket_target_rows": bucket_target,
        "compact_every": compact_every,
        "growth_ratio_total": round(
            last["batch_ms_warm_avg"] / first["batch_ms_warm_avg"], 2
        ),
        "decades": round(
            __import__("math").log10(
                last["history_rows"] / first["history_rows"]
            ), 1
        ),
        "results": results,
    }
    if compact_every and "fold_ms_avg" in first and "fold_ms_avg" in last:
        summary["fold_growth_ratio_total"] = round(
            last["fold_ms_avg"] / max(first["fold_ms_avg"], 1), 2
        )
    print(json.dumps(summary))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else None
    max_fold_rows = int(sys.argv[4]) if len(sys.argv) > 4 else None
    bucket_target = int(sys.argv[5]) if len(sys.argv) > 5 else 1_000_000
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
    fold_metrics: dict = {}
    q = start_corpus_dedup_ingest(
        stream, corpus, ckpt, "doc_id", "text", available_now=True,
        compact_every=compact_every, max_fold_rows=max_fold_rows,
        bucket_target_rows=bucket_target, metrics=fold_metrics,
    )
    q.awaitTermination(1800)
    wall = time.perf_counter() - t0

    log = spark.read.parquet(f"{corpus}/log")
    counts = {r["status"]: r["n"] for r in
              log.groupBy("status").agg(F.count("*").alias("n")).collect()}
    idx_rows = spark.read.parquet(f"{corpus}/index").count()
    compact_root = f"{corpus}/index_compact"
    if os.path.isdir(compact_root):
        for n in os.listdir(compact_root):  # residual + committed runs
            # explicit schema: a committed-empty run dir has no parquet
            # files to infer from
            idx_rows += (
                spark.read.schema("doc_id long, _h long, batch int")
                .parquet(f"{compact_root}/{n}")
                .count()
            )
    # realized history per batch: cumulative FRESH landings (dup rows never
    # enter the index, so i*batch_rows would overstate it by the dup rate)
    # count fresh landings from log/ (never compacted) — index/ loses its
    # folded batch=* dirs after each compact_every cycle, which zeroed the
    # history column for every pre-fold batch in earlier revisions
    fresh_by_batch = {
        r["batch"]: r["n"]
        for r in log.filter(F.col("status") == "fresh")
        .groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    batches = []
    hist = 0
    fold_by_batch = {
        f["batch"]: f for f in fold_metrics.get("fold", [])
    }
    for i, p in enumerate(
        pr for pr in q.recentProgress if pr["numInputRows"] > 0
    ):
        entry = {
            "batch": i,
            "rows": p["numInputRows"],
            "ms": p["durationMs"]["triggerExecution"],
            "history_rows": hist,
        }
        if i in fold_by_batch:
            f = fold_by_batch[i]
            entry["fold_ms"] = f["ms"]
            entry["fold_window_rows"] = f["window_rows"]
            entry["fold_merged_rows"] = f["merged_rows"]
            entry["n_runs"] = f["n_runs"]
            if "slice" in f:
                entry["slice"] = f["slice"]
        batches.append(entry)
        hist += fresh_by_batch.get(i, 0)

    print("| batch | history rows | batch ms | fold ms | merged rows | runs |")
    print("| --- | --- | --- | --- | --- | --- |")
    for b in batches:
        print(
            f"| {b['batch']} | {b['history_rows']} | {b['ms']} | "
            f"{b.get('fold_ms', '-')} | {b.get('fold_merged_rows', '-')} | "
            f"{b.get('n_runs', '-')} |"
        )

    head = [b["ms"] for b in batches[1:4]]
    tail = [b["ms"] for b in batches[-3:]]
    folds = fold_metrics.get("fold", [])
    summary = {
        "metric": "corpus_dedup_ingest",
        "compact_every": compact_every,
        "max_fold_rows": max_fold_rows,
        "bucket_target_rows": bucket_target,
        "fold_ms_avg": (
            round(sum(f["ms"] for f in folds) / len(folds)) if folds else None
        ),
        "fold_ms_max": max((f["ms"] for f in folds), default=None),
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
    if len(sys.argv) > 1 and sys.argv[1] == "decades":
        decades()
    else:
        main()
