"""Empirical scaling check: times representative queries at two scale
factors and prints the wall-time ratio against the 10x data ratio —
the local evidence that operator costs grow (sub)linearly with input,
i.e. no hidden quadratic or driver-bound stage. Usage:
    python tools/scale_check.py [small_dir] [big_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.plans.queries import QUERIES

PROBES = [
    "q01_pricing_summary", "metrics_day", "sla_daily", "dedup_exact_stats",
    "minhash_pairs", "ngram_jaccard", "token_stats", "cosine_topk", "sessionize",
    "dedup_clusters", "tfidf_top_terms",
]


def main():
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    for name in PROBES:
        ts = {}
        for label, d in (("small", small), ("big", big)):
            QUERIES[name](spark, d).collect()          # warm (codegen + FS cache)
            t0 = time.perf_counter()
            QUERIES[name](spark, d).collect()
            ts[label] = time.perf_counter() - t0
        out[name] = {
            "small_s": round(ts["small"], 3),
            "big_s": round(ts["big"], 3),
            "ratio": round(ts["big"] / ts["small"], 2),
        }
        print(f"{name:22s} {ts['small']:.2f}s -> {ts['big']:.2f}s  ratio {out[name]['ratio']}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
