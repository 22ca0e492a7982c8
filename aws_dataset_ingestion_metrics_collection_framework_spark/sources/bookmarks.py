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
- bookmarks are tiny JSON files beside the data, written with the
  driver's LOCAL filesystem (os.path / open / os.replace) — per-JOB
  metadata, not per-row state. An `s3://` or `hdfs://` bookmark_dir is
  NOT supported by this implementation: on such paths `load` would
  silently report "no bookmark" and `advance` would write to a local
  directory literally named `s3:/...`. For object stores, route the
  marker IO through the Hadoop FileSystem API
  (`spark._jvm.org.apache.hadoop.fs.FileSystem`) — the rest of the
  contract is unchanged. The same caveat applies to `streaming/cdc.py`'s
  `_CURRENT` marker.

At 100 TB the watermark filter must prune partitions: bookmark a column
that prefixes the partition layout (e.g. the ingest date) so each
incremental run scans only new partitions, not the table history.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, functions as F


def _path(bookmark_dir: str, job: str) -> str:
    return os.path.join(bookmark_dir, f"{job}.bookmark.json")


def load(bookmark_dir: str, job: str):
    """The stored watermark bound for ``job`` (None before the first run)."""
    p = _path(bookmark_dir, job)
    if not os.path.exists(p):
        return None
    with open(p, "r", encoding="utf-8") as fh:
        return json.load(fh)["watermark"]


def advance(bookmark_dir: str, job: str, watermark) -> None:
    """Persist a new bound (atomic rename — readers never see a torn file).
    Call AFTER the run's output write succeeds: advancing first would turn
    a crash into silent data loss; advancing after turns it into replay."""
    os.makedirs(bookmark_dir, exist_ok=True)
    tmp = _path(bookmark_dir, job) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"watermark": watermark}, fh)
    os.replace(tmp, _path(bookmark_dir, job))


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
    last = load(bookmark_dir, job)
    fresh = df if last is None else df.filter(F.col(watermark_col) > F.lit(last))
    return fresh, F.max(watermark_col).alias("watermark")
