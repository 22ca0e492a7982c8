"""Behavioral event analytics: funnel completion and cohort retention.

The events lake feeds product analytics as much as it feeds metrics; these
are the two canonical sequential queries a warehouse team runs on it —
both awkward to hand-roll correctly (ordering constraints, partial
completion, cohort alignment) and both cleanly expressible as a handful of
conditional aggregations once the semantics are pinned.

Scale shape: every stage is a filtered aggregation keyed on the user —
k funnel steps cost k slim (user, ts) aggregations joined on user (each
input pre-filtered to ONE step's events before it shuffles, so shuffle
volume is per-step event counts, not the corpus), and retention is two
aggregations and a join. Nothing is windowed over raw event order, so no
per-user sort of the full history is ever required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Earliest-completion funnel: for each user who performed ``steps[0]``,
    the timestamp of each successive step STRICTLY AFTER the previous one
    (greedy earliest-completion — the standard funnel semantics: t1 =
    first step-1 event, t_{i+1} = first step-(i+1) event after t_i).

    Returns (user, t1..tk, completed_steps); users absent from step 1 are
    absent from the result, later steps are null once the chain breaks.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("tp"),
    )
    cur = (
        ev.filter(F.col("tp") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("t1"))
    )
    for i in range(1, len(steps)):
        prev, this = f"t{i}", f"t{i + 1}"
        nxt = (
            ev.filter(F.col("tp") == steps[i])
            .join(cur.select("u", prev), "u")
            .filter(F.col("ts") > F.col(prev))
            .groupBy("u")
            .agg(F.min("ts").alias(this))
        )
        cur = cur.join(nxt, "u", "left")
    # Build ascending so the HIGHEST completed step's branch is outermost
    # (each wrap takes precedence over everything below it).
    completed: Column = F.lit(0)
    for i in range(1, len(steps) + 1):
        completed = F.when(F.col(f"t{i}").isNotNull(), F.lit(i)).otherwise(completed)
    return cur.select(
        F.col("u").alias(user_col),
        *[F.col(f"t{i + 1}") for i in range(len(steps))],
        completed.alias("completed_steps"),
    )


def funnel_summary(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """(step, n_users) — how many users reached each step (monotone
    non-increasing by construction). Input is :func:`funnel`'s output."""
    rows = [
        funnel_df.filter(F.col("completed_steps") >= i).agg(
            F.lit(i).alias("step"), F.count(F.lit(1)).alias("n_users")
        )
        for i in range(1, n_steps + 1)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; for each (cohort_week, week_offset) the number of
    distinct cohort users active that week. week_offset 0 row equals the
    cohort size (everyone is active in their first week by definition).
    """
    firsts = (
        df.groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("_first"))
        .select("u", F.date_trunc("week", F.col("_first")).cast("date").alias("cohort_week"))
    )
    active = (
        df.select(
            F.col(user_col).alias("u"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk"),
        )
        .distinct()
    )
    return (
        active.join(firsts, "u")
        .select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("int").alias("week_offset"),
            "u",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("u").alias("n_users"))
    )


def transition_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    state_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next state | current state) — the behavioral fingerprint behind
    next-action prediction, funnel leak hunting ("where do sessions go
    after 'view'?") and bot detection (machine traffic has unnaturally
    peaked rows).

    ``order_cols`` (default [ts_col]) must totally order each user's
    events — a tie would make "next" partition-order-dependent. Output:
    (from_state, to_state, n_transitions, p) with p = count/row-total
    rounded to 6 (exact integer counts; one shared division). Each
    user's last event has no successor and contributes no transition.

    Shape: one user-keyed window (lead) + one (from, to) count with
    map-side combine + a per-from-state total joined back — the count
    table is |states|² rows, not data.
    """
    from pyspark.sql import Window

    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        df.withColumn("_next", F.lead(state_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"),
            F.col("_next").alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = pairs.groupBy("from_state").agg(
        F.sum("n_transitions").alias("_t")
    )
    return (
        pairs.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("_t"), 6).alias("p"),
        )
    )


def suppress_repeats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    within_seconds: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Burst suppression: keep only the FIRST event of each burst per
    key, where a burst is a run of events each within ``within_seconds``
    of its predecessor — the alert-fatigue fix (a flapping monitor fires
    hundreds of identical alerts; responders need one per episode), and
    the same primitive dedups retry storms and double-clicks.

    Chained-gap semantics (a burst extends as long as gaps stay small —
    matching gap-based sessionization, `sessions.sessionize`), not a
    fixed window from the first event: a 10-minute flap with 30-second
    gaps is ONE episode even if it outlives `within_seconds`.

    One key-partitioned window (lag); adds ``burst_id`` (0-based per
    key) to the kept rows so downstream joins can count suppressed
    volume per episode via the complement. ``order_cols`` defaults to
    [ts_col]; supply a tiebreaker for simultaneous events.
    """
    from pyspark.sql import Window

    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    # NTZ timestamps refuse a direct long cast; hop through TIMESTAMP
    secs = F.col(ts_col).cast("timestamp").cast("long")
    gap_ok = (secs - F.lag(secs).over(w)) > within_seconds
    is_start = F.coalesce(gap_ok, F.lit(True))  # first event starts a burst
    marked = df.withColumn("_start", is_start).withColumn(
        "burst_id",
        F.sum(F.col("_start").cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return marked.filter(F.col("_start")).drop("_start")
