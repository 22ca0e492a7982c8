"""Sessionization — gap-based event sessions per user.

Not in the reference (its windows are tumbling-only, SURVEY §2.5), but a core
capability for event-stream analytics: a new session starts when the gap to
the previous event of the same user exceeds ``gap``.

Classic two-window formulation (lag → boundary flag → running sum), one
shuffle on user_id; at 100 TB, sessionization partitions by user and sorts
within partitions — skew-safe because per-user event counts are bounded in
practice (AQE skew handling covers hot users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign ``session_id`` (per-user ordinal, starting at 1) to each event."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds),
        1,
    ).otherwise(0)
    return events.withColumn("session_id", F.sum(new_session).over(w))


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session summary: bounds, event count, value sum."""
    s = sessionize(events, user_col=user_col, ts_col=ts_col, gap_seconds=gap_seconds)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("value_sum"),
    )
