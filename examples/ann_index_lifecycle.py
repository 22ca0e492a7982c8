"""ANN index lifecycle — build once, maintain forever (r12 surface), in
one script:

  embeddings → build IVF index → persist (one file per list dir)
  → day-1 increment: append_to_ivf_index (frozen-centroid assign,
    O(batch)) → replayed append with dedupe=True lands 0 rows
  → gauges (ivf_index_stats + index_layout_stats) → the tested POLICY
    (index_maintenance_plan: append_ok | compact_due | rebuild_due, r13)
  → compact back to one file/dir
  → query through the persisted index before/after — identical rows
  → the same increment flow through the STREAMING sink
    (start_ann_index_ingest: marker + replay-dedupe exactly-once,
    repair-before-append, single-writer _ingest_owner lease — r13)
  → and the sharded path for corpora past the 4096-list clamp.

Every stage is the declared engine helper — the composition story for a
corpus whose embedding table grows daily and cannot afford an O(corpus)
rebuild per day (SCALE.md r12: append = 0.176× rebuild at a 10%
increment; bounded probed rows per query at any corpus size sharded).

Usage: python examples/ann_index_lifecycle.py [out_dir] [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import similarity as SIM
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming import (
    start_ann_index_ingest,
)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ann_lc_")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="ann-index-lifecycle", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 3 != 0)          # the existing corpus
    day1 = emb.filter(F.col("vec_id") % 3 == 0).limit(200)  # today's crawl

    # 1. build once, persist in the query-ready layout
    root = os.path.join(out_dir, "ivf")
    SIM.persist_ivf_index(
        SIM.build_ivf_index(base, n_lists="auto"), root, mode="overwrite"
    )
    queries = base.filter(F.col("vec_id") < 10)
    before = SIM.ivf_ann_topk(
        queries, emb, k=5, n_probe=8,
        index=SIM.load_ivf_index(spark, root), scorer="hof",
    ).count()
    print(f"[build]   persisted index over {base.count()} vectors; "
          f"query returns {before} rows")

    # 2. daily increment: O(batch), replay-idempotent
    n = SIM.append_to_ivf_index(spark, root, day1, dedupe=True)
    replay = SIM.append_to_ivf_index(spark, root, day1, dedupe=True)
    print(f"[append]  day-1 increment: {n} appended, replay appended {replay}")

    # 3. gauges → POLICY → compact → results unchanged: the layout gauge
    #    (files per dir, pure metadata) joins the occupancy stats, and
    #    index_maintenance_plan turns them into the action the loop
    #    branches on — the appends above left >1 file in the touched
    #    dirs, so with a tight threshold the verdict is compact_due
    stats_df = SIM.ivf_index_stats(SIM.load_ivf_index(spark, root)[1])
    stats = stats_df.first()
    print(f"[stats]   rows={stats['n_rows']} max_occ={stats['max_occupancy']} "
          f"skew={stats['skew']} rebalance={stats['rebalance_recommended']}")
    layout = SIM.index_layout_stats(spark, root)
    verdict = SIM.index_maintenance_plan(
        stats_df.withColumn("files_per_dir", F.lit(layout["max_files_per_dir"])),
        max_files_per_dir=1,
    ).first()
    print(f"[plan]    files/dir={layout['max_files_per_dir']} → "
          f"action={verdict['action']} reasons={list(verdict['reasons'])}")
    assert verdict["action"] == "compact_due", verdict
    SIM.compact_ivf_index(spark, root)
    after = SIM.ivf_ann_topk(
        queries, emb, k=5, n_probe=8,
        index=SIM.load_ivf_index(spark, root), scorer="hof",
    ).count()
    assert after == before, (before, after)
    print(f"[compact] one file per list dir restored; query rows unchanged ({after})")

    # 4. the same increment flow as a STREAMING topology: drop vector
    #    files into a dir, the sink appends each micro-batch exactly once
    day2 = emb.filter(F.col("vec_id") % 3 == 0).orderBy(F.desc("vec_id")).limit(100)
    src = os.path.join(out_dir, "incoming")
    os.makedirs(src, exist_ok=True)
    (
        day2.select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
        .coalesce(1).write.mode("overwrite").json(os.path.join(src, "drop"))
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .json(os.path.join(src, "drop"))
    )
    q = start_ann_index_ingest(
        stream, root, os.path.join(out_dir, "ckpt"),
        compact_every=1, available_now=True,
    )
    q.awaitTermination(180)
    total = SIM.load_ivf_index(spark, root)[1].count()
    print(f"[stream]  sink landed the drop; index now {total} rows")

    # 4b. single-writer lease: the sink stamped _ingest_owner with its
    #     checkpoint dir — a second topology (different checkpoint) is
    #     refused until an explicit takeover, so two writers can never
    #     interleave replay markers
    try:
        start_ann_index_ingest(
            stream, root, os.path.join(out_dir, "ckpt_other"), available_now=True
        )
        raise AssertionError("second writer was not refused")
    except ValueError as ex:
        print(f"[lease]   second topology refused: {str(ex)[:68]}...")

    # 5. past the clamp: the sharded path (bounded probed rows per query)
    sroot = os.path.join(out_dir, "sharded")
    SIM.persist_sharded_ivf_index(
        SIM.build_sharded_ivf_index(emb, n_shards=2, n_lists="auto"),
        sroot, mode="overwrite",
    )
    shards = SIM.load_sharded_ivf_index(spark, sroot)
    topk = SIM.sharded_ivf_ann_topk(queries, shards, k=5, n_probe=8).count()
    gauge = {
        r["shard"]: r["n_rows"]
        for r in SIM.sharded_ivf_index_stats(shards).collect()
    }
    print(f"[sharded] 2-shard index, global-budget query rows={topk}, "
          f"per-shard rows={ {k: v for k, v in gauge.items() if k >= 0} }")
    print(f"done → {out_dir}")
    if len(sys.argv) < 2:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
