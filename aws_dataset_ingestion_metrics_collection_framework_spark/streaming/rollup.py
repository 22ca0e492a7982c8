"""Streaming materialized-rollup maintenance: an event stream folded into
a persisted aggregate state, O(increment + |state|) per micro-batch.

The batch side (`operators/rollup.py`) proves merge(state, partials(inc))
== full recompute; this module runs that fold continuously under
`foreachBatch`, reusing the versioned-directory + `_CURRENT`-marker commit
protocol of `streaming/cdc.py` (same crash-safety analysis). One semantic
difference from the CDC merge matters for replay: the rollup fold is NOT
idempotent — merging the same batch twice double-counts — so the
marker == `_v<batch_id>` replay guard (crash landed between marker repoint
and checkpoint commit) is what makes delivery effectively-once here, not
merely an overwrite-error workaround.

Unlike watermark-windowed streaming aggregation, state lives in PARQUET
(not the state store), so it survives checkpoint loss, serves batch
readers directly, and has no lateness cutoff: an event from any past
window folds into that window's row whenever it arrives. The trade is a
full state rewrite per batch — fine while |state| ≈ groups × windows is
table-of-rollups sized; at larger state, swap the commit for a lake
format's native MERGE (same seam as streaming/cdc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.rollup import finalize_rollup, merge_rollup, rollup_partials
from .cdc import _commit_snapshot, _current_version, _prune_versions, read_snapshot


def read_rollup(
    spark: SparkSession, state_path: str, *, ndigits: int = 6
) -> DataFrame | None:
    """Consumer-facing finalized view of the maintained state (derived
    aggregates computed at read time); None before the first commit."""
    state = read_snapshot(spark, state_path)
    return None if state is None else finalize_rollup(state, ndigits=ndigits)


def start_rollup_maintenance(
    events: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    *,
    granularity: str = "day",
    trigger_seconds: int | None = None,
    available_now: bool = False,
    keep_history: bool = False,
) -> StreamingQuery:
    """Continuously fold a streaming event source into the rollup state at
    ``state_path``: per micro-batch, aggregate the batch to partials,
    merge with the stored state, commit as a new version, repoint the
    marker, prune superseded versions (unless ``keep_history``)."""
    spark = events.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        version = f"_v{batch_id}"
        current = _current_version(state_path)
        if current == version:
            # Replay after a crash between marker repoint and checkpoint
            # commit: the batch is already folded in. Re-merging would
            # double-count (the fold is not idempotent) — must no-op.
            return
        part = rollup_partials(
            batch_df, key_cols, ts_col, value_col, granularity=granularity
        )
        base = read_snapshot(spark, state_path)
        state = part if base is None else merge_rollup(base, part)
        _commit_snapshot(state, state_path, version)
        if not keep_history:
            _prune_versions(
                state_path, keep={version} | ({current} if current else set())
            )

    writer = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
