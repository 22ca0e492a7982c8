"""Per-job breakdown of ONE declared query face (guide §1: measure first).

Runs ``QUERIES[name]`` exactly the way ``bench.py --worker`` does (fresh
session, warmup job, register tables, timed ``.collect()``), then reads the
live Spark UI REST API (localhost, no network) and prints every Spark job the
face ran with its duration — the fixed-overhead census that tells us whether
a contract face's seconds are data or job-count.

Usage: python tools/face_profile.py <query> [sf_dir] [--repeat N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
    from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import (
        register_tables,
    )
    from aws_dataset_ingestion_metrics_collection_framework_spark.plans.queries import (
        QUERIES,
    )

    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_tables(spark, sf_dir)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_now():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            return json.load(r)

    n_before = len(jobs_now())
    best = None
    for i in range(repeat):
        t0 = time.perf_counter()
        rows = QUERIES[name](spark, sf_dir).collect()
        took = time.perf_counter() - t0
        best = took if best is None else min(best, took)
        print(f"# run {i}: {took:.3f}s ({len(rows)} rows)", file=sys.stderr)
        if i == 0:
            jobs = [j for j in jobs_now() if j["jobId"] >= n_before]

    def dur(j):
        try:
            t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ms = (time.mktime(t1) - time.mktime(t0)) * 1000
            ms += int(j["completionTime"][20:23]) - int(j["submissionTime"][20:23])
            return ms / 1000.0
        except Exception:
            return -1.0

    jobs = sorted(jobs, key=dur, reverse=True)
    total = sum(max(0.0, dur(j)) for j in jobs)
    print(f"face={name} best={best:.3f}s first_run_jobs={len(jobs)} "
          f"sum_job_sec={total:.2f}")
    for j in jobs[:40]:
        desc = (j.get("description") or j.get("name") or "")[:110]
        print(f"  {dur(j):7.3f}s  stages={len(j['stageIds']):3d}  "
              f"tasks={j['numTasks']:4d}  {desc}")
    gap = best - total if best else 0
    print(f"# driver/plan-time gap (best-run wall − job sum, first run "
          f"overstates): {gap:.2f}s")


if __name__ == "__main__":
    main()
