"""ANN index lifecycle — build once, maintain forever (r12 surface), in
one script:

  embeddings → build IVF index → persist (one file per list dir)
  → day-1 increment: append_to_ivf_index (frozen-centroid assign,
    O(batch)) → replayed append with dedupe=True lands 0 rows
  → gauges (ivf_index_stats + index_layout_stats) → the tested POLICY
    (index_maintenance_plan: append_ok | compact_due | rebuild_due, r13)
    → EXECUTED by apply_maintenance_plan (r14): compact_due compacts,
    and the loop re-gauges back to append_ok
  → query through the persisted index before/after — identical rows
  → the same increment flow through the STREAMING sink
    (start_ann_index_ingest: marker + replay-dedupe exactly-once,
    repair-before-append, single-writer _ingest_owner lease — r13)
  → the sharded path for corpora past the 4096-list clamp — including
    DRIFT: a hot-cluster increment skews one shard past the rebuild
    threshold and apply_maintenance_plan rebuilds THAT SHARD ONLY from
    its own stored vectors (r14)
  → and the IVF-PQ composition (r14): codes in the lists bound probed
    BYTES the way sharding bounds probed ROWS; ADC top-k + exact rerank.

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

    # 3. gauges → POLICY → EXECUTE, one call: apply_maintenance_plan
    #    computes the occupancy + layout gauges, runs
    #    index_maintenance_plan, and executes each verdict row — the
    #    appends above left >1 file in the touched dirs, so with a tight
    #    threshold the verdict is compact_due and the executor compacts
    rep = SIM.apply_maintenance_plan(spark, root, max_files_per_dir=1).first()
    print(f"[execute] rows={rep['n_rows']} skew={rep['skew']} "
          f"files/dir={rep['files_per_dir']} → action={rep['action']} "
          f"executed={rep['executed']}")
    assert (rep["action"], rep["executed"]) == ("compact_due", "compacted"), rep
    rep2 = SIM.apply_maintenance_plan(spark, root, max_files_per_dir=1).first()
    assert rep2["action"] == "append_ok", rep2
    after = SIM.ivf_ann_topk(
        queries, emb, k=5, n_probe=8,
        index=SIM.load_ivf_index(spark, root), scorer="hof",
    ).count()
    assert after == before, (before, after)
    print(f"[compact] re-gauge says {rep2['action']}; query rows unchanged ({after})")

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

    # 6. DRIFT → per-shard rebuild: a tight cluster of near-identical
    #    vectors (a hot crawl topic) routed to one shard piles into a
    #    single frozen list; the policy flags THAT shard rebuild_due and
    #    the executor rebuilds it alone — the other shard's centroids
    #    are untouched and the gauge returns to append_ok
    dim = len(emb.first()["embedding"])
    jitter = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.lit(0.5)
        + (F.pmod(F.xxhash64(F.col("vec_id") * dim + j), F.lit(2001)) - 1000)
        .cast("double") / 1000.0 * 0.15,
    )
    # sized so the cluster skews the frozen centroids hard (one list
    # absorbs it all) but a rebuild's fresh seeds can actually spread it
    # — a cluster that OUTNUMBERS the shard re-concentrates even under
    # fresh k-means (one Lloyd step is not a balancing partitioner) and
    # would honestly re-flag, which is the policy working, not the demo
    drift = (
        spark.range(600)
        .select((F.col("id") + 20_000_000).alias("vec_id"))
        .select("vec_id", jitter.alias("embedding"))
        .filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(2)) == 1)
    )
    SIM.append_to_sharded_ivf_index(spark, sroot, drift)
    kw = dict(skew_threshold=4.0, min_rows_for_rebuild=10, max_files_per_dir=50)
    report = {r["shard"]: r for r in SIM.apply_maintenance_plan(spark, sroot, **kw).collect()}
    print("[drift]   " + "; ".join(
        f"shard {s}: {r['action']}→{r['executed']} (skew {r['skew']})"
        for s, r in sorted(report.items()) if s >= 0
    ))
    assert report[1]["executed"] == "rebuilt" and report[0]["executed"] == "none", report
    healthy = {r["shard"]: r["action"] for r in SIM.apply_maintenance_plan(spark, sroot, **kw).collect()}
    assert all(a == "append_ok" for a in healthy.values()), healthy
    print(f"[rebuilt] only the skewed shard; re-gauge: {healthy}")

    # 7. IVF-PQ: the byte-cut composition — the ADC stage reads m ints
    #    per candidate (parquet column pruning), rerank reads full
    #    vectors for just the ADC top-R
    proot = os.path.join(out_dir, "ivfpq")
    SIM.persist_ivfpq_index(
        SIM.build_ivfpq_index(emb, n_lists="auto", m=4, pq_k=16),
        proot, m=4, pq_k=16, mode="overwrite",
    )
    pidx, pparams = SIM.load_ivfpq_index(spark, proot)
    pq_rows = SIM.ivfpq_ann_topk(
        queries, pidx, k=5, n_probe=8, rerank=20, scorer="hof", **pparams
    ).count()
    print(f"[ivfpq]   ADC probe + exact rerank rows={pq_rows}")
    print(f"done → {out_dir}")
    if len(sys.argv) < 2:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
