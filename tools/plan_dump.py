"""Dump `.explain("formatted")` for the representative inner pipeline of the
ANN contract faces touched this round (guide §1/§7.2 evidence artifacts).

The contract faces return a literal one-row verdict DataFrame, so explaining
the face's RETURN value shows only a LocalTableScan; the optimization lives in
the lineage of the inner query the face runs many actions over. This tool
rebuilds exactly that inner DataFrame per face — once over the RAW built index
(`--raw`, the pre-optimization shape: full build lineage replayed per action)
and by default over the `materialize_index`-pinned build (the post shape: the
build computed once, later actions scanning checkpointed blocks) — and prints
the formatted plan.

Usage: python tools/plan_dump.py <face> [sf_dir] [--raw]
Faces: ivf_ann_persisted pq_ann_persisted ivfpq_ann_persisted
       sharded_ivf_ann sharded_ivfpq_ann sharded_build_materialized
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    face = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    raw = "--raw" in sys.argv

    from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators import (
        similarity as SIM,
    )

    spark = get_spark(app_name=f"plan-{face}")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def pin(idx):
        return idx if raw else SIM.materialize_index(idx)

    if face == "ivf_ann_persisted":
        built = pin(SIM.build_ivf_index(emb, n_lists=8))
        df = SIM.ivf_ann_topk(
            emb.filter(F.col("vec_id") < 10), emb, k=5, n_probe=6,
            index=built, scorer="hof",
        )
    elif face == "pq_ann_persisted":
        built = pin(SIM.pq_index(emb, m=4))
        df = SIM.pq_ann_topk(
            emb.filter(F.col("vec_id") < 5), emb, k_neighbors=3, m=4,
            index=built,
        )
    elif face == "ivfpq_ann_persisted":
        built = pin(SIM.build_ivfpq_index(emb, n_lists=8, m=4, pq_k=16))
        df = SIM.ivfpq_ann_topk(
            emb.filter(F.col("vec_id") < 5), built, k=5, n_probe=6,
            scorer="hof",
        )
    elif face == "sharded_ivf_ann":
        idx = pin(SIM.build_sharded_ivf_index(emb, n_shards=2, n_lists=6))
        df = SIM.sharded_ivf_ann_topk(
            emb.filter(F.col("vec_id") < 10), idx, k=5, n_probe=12,
            scorer="hof",
        )
    elif face == "sharded_ivfpq_ann":
        idx = pin(SIM.build_sharded_ivfpq_index(
            emb, n_shards=2, n_lists=6, m=4, pq_k=16))
        df = SIM.sharded_ivfpq_ann_topk(
            emb.filter(F.col("vec_id") < 5), idx, k=5, n_probe=6,
            scorer="hof",
        )
    elif face == "sharded_build_materialized":
        idx = pin(SIM.build_sharded_ivf_index(emb, n_shards=3, n_lists=6))
        df = SIM.sharded_ivf_ann_topk(
            emb.filter(F.col("vec_id") < 8), idx, k=4, n_probe=5,
            scorer="hof",
        )
    else:
        raise SystemExit(f"unknown face {face!r} — see module docstring")

    df.explain("formatted")


if __name__ == "__main__":
    main()
