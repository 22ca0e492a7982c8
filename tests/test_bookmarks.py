"""Incremental-bookmark tests: slices never skip, never double-process
(given unique watermarks), and crash-before-advance replays."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.sources import bookmarks as BM


@pytest.fixture
def bmdir():
    d = tempfile.mkdtemp(prefix="bm_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, df, bmdir, job="j"):
    fresh, hi = BM.incremental_slice(df, "seq", bmdir, job)
    rows = sorted(r["seq"] for r in fresh.select("seq").collect())
    mark = fresh.agg(hi).collect()[0][0]
    if mark is not None:
        BM.advance(bmdir, job, mark)
    return rows


def test_incremental_slices_partition_the_stream(spark, bmdir):
    batch1 = spark.range(10).select(F.col("id").alias("seq"))
    assert _run(spark, batch1, bmdir) == list(range(10))
    # second run over the SAME data: nothing new
    assert _run(spark, batch1, bmdir) == []
    # appended rows: only the delta processes
    batch2 = spark.range(15).select(F.col("id").alias("seq"))
    assert _run(spark, batch2, bmdir) == [10, 11, 12, 13, 14]


def test_crash_before_advance_replays_not_skips(spark, bmdir):
    df = spark.range(5).select(F.col("id").alias("seq"))
    fresh, hi = BM.incremental_slice(df, "seq", bmdir, "j")
    assert fresh.count() == 5
    # simulate crash: no advance() — the next run sees everything again
    fresh2, _ = BM.incremental_slice(df, "seq", bmdir, "j")
    assert fresh2.count() == 5


def test_jobs_are_isolated(spark, bmdir):
    df = spark.range(3).select(F.col("id").alias("seq"))
    assert _run(spark, df, bmdir, "a") == [0, 1, 2]
    assert _run(spark, df, bmdir, "b") == [0, 1, 2]  # b unaffected by a
