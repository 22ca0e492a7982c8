"""Stream-stream event-time joins: attribution within a time bound.

The reference's streaming topology needs only stream-static enrichment
(`streaming/pipeline.py`); this adds the genuinely two-sided case a
behavioral pipeline hits first: ATTRIBUTION — match each response event
(click, purchase, alarm-clear) to the triggering event (impression,
alert) on a shared key within a bounded event-time window.

Semantics (same for the batch and streaming shapes, pinned equal by
test_streaming_joins): inner join on `key_col` with

    trigger.ts <= response.ts < trigger.ts + within

Both operators emit ONE ROW PER QUALIFYING PAIR — dedup/first-touch
selection is a downstream `max_by`/`min_by` choice, not baked in.

Streaming state story: Structured Streaming keeps both sides' rows in
state until the watermark passes their join-condition reach. The
`within` bound plus per-side watermarks make that state BOUNDED — an
unconstrained stream-stream join's state grows forever; the time-range
predicate is what lets Spark expire rows (trigger rows expire `within` +
delay after their event time, response rows after `delay`). At 100 TB/day
both streams shuffle on the key — same exchange the batch join pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribution_join(
    triggers: DataFrame,
    responses: DataFrame,
    key_col: str,
    *,
    trigger_ts: str = "ts",
    response_ts: str = "ts",
    within_seconds: int = 3600,
    prefix: tuple[str, str] = ("t_", "r_"),
) -> DataFrame:
    """Batch/streaming-agnostic attribution join (works on static frames
    as-is; for streams apply `with_watermarks` first). Output columns:
    the key, then every non-key column of each side under its prefix."""
    tp, rp = prefix
    t = triggers.select(
        F.col(key_col),
        *[F.col(c).alias(f"{tp}{c}") for c in triggers.columns if c != key_col],
    )
    r = responses.select(
        F.col(key_col),
        *[F.col(c).alias(f"{rp}{c}") for c in responses.columns if c != key_col],
    )
    tts, rts = F.col(f"{tp}{trigger_ts}"), F.col(f"{rp}{response_ts}")
    # range predicate lives IN the join condition — that is what lets the
    # streaming planner derive state-expiry bounds (a post-join filter
    # would leave both sides' state unbounded)
    cond = (
        (t[key_col] == r[key_col])
        & (tts <= rts)
        & (rts < tts + F.expr(f"INTERVAL {int(within_seconds)} SECONDS"))
    )
    return t.join(r, cond, "inner").drop(r[key_col])


def with_watermarks(
    triggers: DataFrame,
    responses: DataFrame,
    *,
    trigger_ts: str = "ts",
    response_ts: str = "ts",
    delay_seconds: int = 600,
) -> tuple[DataFrame, DataFrame]:
    """Watermark both streaming sides (required for state expiry in a
    stream-stream join): each side tolerates `delay_seconds` of event-time
    lateness; rows later than that may be dropped — the standard
    correctness/state trade, choose the delay from measured lateness."""
    return (
        triggers.withWatermark(trigger_ts, f"{int(delay_seconds)} seconds"),
        responses.withWatermark(response_ts, f"{int(delay_seconds)} seconds"),
    )
