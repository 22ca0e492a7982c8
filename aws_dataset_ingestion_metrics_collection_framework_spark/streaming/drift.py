"""Streaming drift monitoring: per-micro-batch PSI against a pinned
baseline distribution.

The batch gate (`operators/dq.psi_drift`) answers "did this slice
drift?"; this runs that question continuously: each micro-batch's value
distribution is scored against a FIXED baseline (the training/reference
slice — pinned, not rolling: scoring against a rolling window lets slow
drift walk the baseline along with it, the classic boiled-frog failure),
and one (batch_id, psi, n) row is appended per batch to a parquet log —
the time series an alerting rule watches.

State: none beyond the broadcast baseline bin counts (computed once,
driver-side rows ≤ bins+2). Each batch is one slim bin-count aggregation;
the raw stream never shuffles anything but bin ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dq import psi_drift


def start_drift_monitor(
    stream: DataFrame,
    baseline: DataFrame,
    value_col: str,
    log_path: str,
    checkpoint_dir: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    trigger_seconds: int | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuously score the stream's `value_col` distribution against
    `baseline` (same [lo, hi, bins] grid rules as `psi_drift`); logs one
    (batch_id, n_rows, psi) row per micro-batch under `log_path`. Empty
    batches log psi NULL (no distribution to score — not 'no drift').

    The log write is batch-scoped (overwrite of `psi_batch=<id>/`), so a
    replay after a crash rewrites its own row instead of appending a
    duplicate — the same exactly-once-under-replay discipline as
    ``start_ingest`` (foreachBatch is at-least-once; the r12 chaos drill
    SIGKILLs mid-batch and checks the logs)."""
    spark = stream.sparkSession

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            row = spark.createDataFrame(
                [(batch_id, 0, None)], "batch_id long, n_rows long, psi double"
            )
        else:
            total = (
                psi_drift(baseline, batch_df, value_col, lo=lo, hi=hi, bins=bins)
                .filter(F.col("slot") == -1)
                .select(F.col("psi_term").alias("psi"))
                .collect()[0]["psi"]
            )
            row = spark.createDataFrame(
                [(batch_id, n, float(total))],
                "batch_id long, n_rows long, psi double",
            )
        row.write.mode("overwrite").parquet(f"{log_path}/psi_batch={batch_id}")

    writer = (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
