"""Streaming snapshot maintenance: a changelog stream continuously merged
into a live latest-version table.

The batch operators (`operators/cdc.py`) answer "what is the current
state, given all changes so far"; this module keeps that answer WARM: each
micro-batch of changes is merged into the persisted snapshot with the same
versioning semantics (max_by on the sequence struct), so readers always
see a complete, deduplicated current table — the streaming face of a
MERGE-maintained mirror, built from the engine's existing primitives.

Tombstone handling: the STORED snapshot keeps tombstone rows (the latest
version per key, whatever it is); deletes are applied at READ time
(`read_live`). Dropping tombstones at write time would let a late-arriving
lower-sequence upsert in a later batch resurrect a deleted key — with the
tombstone retained, versioning outranks late data correctly. Prune
tombstones older than the stream's effective lateness bound offline if
storage matters.

Consistency model: `foreachBatch` gives per-micro-batch atomicity of the
COMPUTE; the swap to readers is a marker-file repoint — each merge writes
a full snapshot to `<path>/_v<batch_id>` and atomically rewrites the
`_CURRENT` marker afterwards, so a crash mid-write never corrupts the
readable snapshot (readers resolve the marker, which only ever names a
fully-written version). Snapshot size, not stream history, bounds the
merge cost: each batch shuffles snapshot+batch rows once on the key.

Replay safety: a restart from checkpoint re-delivers the last
micro-batch with the SAME batch_id. If the prior attempt crashed before
the marker repoint, the replay simply redoes the merge (idempotent under
max_by). If it crashed AFTER the repoint (marker committed, checkpoint
not), the snapshot already contains the batch — and naively re-merging
would read `_v<batch_id>` while overwriting that same directory, which
Spark rejects. `merge_batch` therefore detects marker == `_v<batch_id>`
and makes the replay an explicit no-op.

Storage: superseded version directories are pruned after each successful
commit, keeping the immediately-previous version for readers that
resolved the marker just before the repoint (their scan is already
planned against concrete files). ``keep_history=True`` retains versions
for audit/time travel; pair it with ``retain_versions=N`` to bound the
timeline to the newest N (unbounded growth otherwise — every batch adds
a full snapshot copy).

Marker, version-listing and prune IO is scheme-aware via
`sources/fsio.py`: plain local snapshot paths use direct ``os`` IO, and
any ``scheme://`` path (``file://``, ``hdfs://``, ``s3a://``, ...) goes
through the Hadoop FileSystem API with the same FileSystem instances
Spark's own parquet reads resolve — snapshots work wherever the lake
lives. See fsio's docstring for the rename-commit atomicity contract.

At scale, replace the full-rewrite merge with a lakehouse table format's
native MERGE (Delta/Iceberg/Hudi) — the operator seam is format-agnostic
by design; what this module adds is exactly-once maintenance semantics
with nothing but parquet directories.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.cdc import upsert_latest
from ..sources import fsio

CURRENT_MARKER = "_CURRENT"


def _current_version(
    path: str, spark: SparkSession | None = None
) -> str | None:
    """Version name the `_CURRENT` marker points at, or None pre-commit."""
    raw = fsio.read_text(fsio.urljoin(path, CURRENT_MARKER), spark)
    return None if raw is None else raw.strip()


def read_snapshot(spark: SparkSession, path: str) -> DataFrame | None:
    """Resolve the current snapshot version (tombstone rows included) via
    the marker file; None when no snapshot has been committed yet."""
    version = _current_version(path, spark)
    if version is None:
        return None
    return spark.read.parquet(fsio.urljoin(path, version))


def list_versions(path: str, spark: SparkSession | None = None) -> list[int]:
    """Batch ids of retained snapshot versions, ascending. With
    ``keep_history=True`` maintenance this is the full timeline (or the
    newest ``retain_versions``); with pruning it is {previous, current}."""
    out = []
    for name in fsio.list_names(path, spark):
        if name.startswith("_v") and name[2:].isdigit() and fsio.is_dir(
            fsio.urljoin(path, name), spark
        ):
            out.append(int(name[2:]))
    return sorted(out)


def read_snapshot_at(
    spark: SparkSession, path: str, batch_id: int
) -> DataFrame | None:
    """Time travel: the snapshot as of micro-batch ``batch_id`` — the
    newest retained version ≤ batch_id (matching lake-format AS-OF
    semantics, where a query pins the last commit at-or-before the
    requested point). None when no retained version qualifies; requires
    maintenance with ``keep_history=True`` for arbitrary lookback."""
    eligible = [v for v in list_versions(path, spark) if v <= batch_id]
    if not eligible:
        return None
    return spark.read.parquet(fsio.urljoin(path, f"_v{eligible[-1]}"))


def read_live(
    spark: SparkSession, path: str, delete_predicate: Column
) -> DataFrame | None:
    """The reader-facing view: current snapshot minus tombstoned keys."""
    snap = read_snapshot(spark, path)
    return None if snap is None else snap.filter(~delete_predicate)


def _commit_snapshot(df: DataFrame, path: str, version: str) -> None:
    df.write.mode("overwrite").parquet(fsio.urljoin(path, version))
    fsio.write_text_atomic(  # atomic repoint
        fsio.urljoin(path, CURRENT_MARKER), version, df.sparkSession
    )


def _prune_versions(
    path: str, keep: set[str], spark: SparkSession | None = None
) -> None:
    """Delete superseded `_v*` snapshot directories not in ``keep``.

    ``keep`` always contains the just-committed version plus its immediate
    predecessor — a reader that resolved the marker right before the
    repoint still has concrete file paths planned against the predecessor.
    """
    for name in fsio.list_names(path, spark):
        if name.startswith("_v") and name not in keep:
            target = fsio.urljoin(path, name)
            if fsio.is_dir(target, spark):
                fsio.delete(target, recursive=True, spark=spark)


def start_snapshot_maintenance(
    changes: DataFrame,
    snapshot_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    seq_cols: list[str],
    *,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    keep_history: bool = False,
    retain_versions: int | None = None,
) -> StreamingQuery:
    """Continuously merge a streaming changelog into the snapshot at
    ``snapshot_path``: per micro-batch, union the current snapshot with the
    batch, keep the max_by-version row per key, commit as a new version,
    repoint the marker, prune superseded versions (unless
    ``keep_history``).

    ``retain_versions`` (version GC, only meaningful with
    ``keep_history=True``): keep at most the newest N versions — the
    time-travel window becomes the trailing N commits instead of
    unbounded growth (each version is a FULL snapshot copy; a day of
    10-second triggers is ~8 640 copies). N is floored at 2 so the
    just-committed version's predecessor always survives for in-flight
    readers; None keeps everything."""
    spark = changes.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        version = f"_v{batch_id}"
        current = _current_version(snapshot_path, spark)
        if current == version:
            # Crash landed between the marker repoint and the checkpoint
            # commit: this batch is already IN the current snapshot.
            # Re-merging would read `version` while overwriting the same
            # directory (Spark refuses) — the replay is a no-op.
            return
        base = read_snapshot(spark, snapshot_path)
        merged_input = batch_df if base is None else base.unionByName(batch_df)
        snap = upsert_latest(merged_input, key_cols, seq_cols)
        # Versioned dirs keep the previous snapshot readable throughout the
        # write (and `snap` itself reads the directory an in-place overwrite
        # would clobber).
        _commit_snapshot(snap, snapshot_path, version)
        if not keep_history:
            _prune_versions(
                snapshot_path,
                keep={version} | ({current} if current else set()),
                spark=spark,
            )
        elif retain_versions is not None:
            newest = list_versions(snapshot_path, spark)[
                -max(retain_versions, 2):
            ]
            _prune_versions(
                snapshot_path,
                keep={f"_v{v}" for v in newest},
                spark=spark,
            )

    writer = (
        changes.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
