"""Snapshot `.explain("formatted")` for declared queries into
plans/$PLANS_ROUND/ (default r15).

Usage: [PLANS_ROUND=rNN] python tools/plans_snapshot.py <suffix> [query ...]

Writes plans/<round>/<query>_<suffix>.txt for each query (default: every
bench.py HEADLINE entry). Contract faces that return a literal verdict
row explain as a LocalTableScan — those are covered separately by
tools/plan_dump.py over their inner pipelines; this tool still records
them (the LocalTableScan IS their return plan) plus every real query's
full formatted plan.

The explain itself runs no jobs for pure-transform queries; contract
faces DO execute their driver-side actions while being constructed, so
running this tool costs roughly one suite pass. Run it off the bench
window.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)

    from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
    from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import (
        register_tables,
    )
    from aws_dataset_ingestion_metrics_collection_framework_spark.plans.queries import (
        QUERIES,
    )
    import bench

    names = sys.argv[2:] or list(bench.HEADLINE)
    spark = get_spark(app_name=f"plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, sf_dir)

    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # pragma: no cover - diagnostic tool
            text = f"EXPLAIN FAILED: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} bytes)")


if __name__ == "__main__":
    main()
