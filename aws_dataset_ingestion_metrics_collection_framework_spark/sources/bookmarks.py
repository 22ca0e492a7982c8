"""Job bookmarks: incremental batch processing over an append-only lake.

The reference schedules its scrapes on EventBridge cron and relies on AWS
Glue's job-bookmark machinery to avoid reprocessing (its Glue job config
surface); engine-side the same contract is a persisted high-watermark per
(job, source): each run processes only rows with watermark column strictly
greater than the stored bound, then advances the bound to the max it saw.

Semantics pinned here:

- **at-least-once**: the bookmark advances AFTER the caller's write
  succeeds (caller calls :func:`advance` explicitly) — a crash between
  processing and advancing replays the slice, it never skips one;
- **closed-open slices**: `(last, max_seen]` — a row equal to the stored
  bound is already processed; strict `>` means duplicate watermark values
  spanning a run boundary would be SKIPPED, so pick a watermark that is
  unique-per-row (event ids, file mod times + paths) or accept slice-edge
  replay by bookmarking `max - epsilon`;
- bookmarks are tiny JSON files beside the data, addressed by the same
  URI scheme as the data: plain local paths use direct ``os`` IO; any
  ``scheme://`` bookmark_dir (``file://``, ``hdfs://``, ``s3a://``, ...)
  routes through the Hadoop FileSystem API via `sources/fsio.py`, using
  the exact FileSystem/credentials Spark's own reads resolve — wherever
  `spark.read.parquet(dir)` works, the bookmark beside it works. See
  fsio's module docstring for the per-filesystem rename-commit
  atomicity contract.

At 100 TB the watermark filter must prune partitions: bookmark a column
that prefixes the partition layout (e.g. the ingest date) so each
incremental run scans only new partitions, not the table history.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from . import fsio


def _path(bookmark_dir: str, job: str) -> str:
    return fsio.urljoin(bookmark_dir, f"{job}.bookmark.json")


def load(bookmark_dir: str, job: str, spark: SparkSession | None = None):
    """The stored watermark bound for ``job`` (None before the first run)."""
    raw = fsio.read_text(_path(bookmark_dir, job), spark)
    return None if raw is None else json.loads(raw)["watermark"]


def advance(
    bookmark_dir: str, job: str, watermark, spark: SparkSession | None = None
) -> None:
    """Persist a new bound (rename-commit — readers never see a torn file).
    Call AFTER the run's output write succeeds: advancing first would turn
    a crash into silent data loss; advancing after turns it into replay."""
    fsio.write_text_atomic(
        _path(bookmark_dir, job), json.dumps({"watermark": watermark}), spark
    )


def incremental_slice(
    df: DataFrame, watermark_col: str, bookmark_dir: str, job: str
) -> tuple[DataFrame, Column]:
    """(new_rows, max_watermark_column) for this run: rows strictly above
    the stored bound, plus the aggregate expression to advance with.

    Usage::

        fresh, hi = incremental_slice(events, "ts", bmdir, "scrape")
        out = process(fresh)
        out.write...                       # side effect first
        new_mark = fresh.agg(hi).collect()[0][0]
        if new_mark is not None:
            advance(bmdir, "scrape", str(new_mark))
    """
    last = load(bookmark_dir, job, df.sparkSession)
    fresh = df if last is None else df.filter(F.col(watermark_col) > F.lit(last))
    return fresh, F.max(watermark_col).alias("watermark")
