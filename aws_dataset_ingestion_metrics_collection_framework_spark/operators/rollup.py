"""Incremental rollup maintenance: materialized aggregates kept current by
merging partial states, never by rescanning history.

The reference framework recomputes its windowed metric aggregations from
the raw firehose each scrape (`metrics_streamer` stack; SURVEY.md §2 A1/W1).
That is O(history) per refresh — fine for day-old windows, fatal at 100 TB
where a year of events dwarfs a day's increment. The standard fix is the
materialized-view/hypertable-rollup pattern: store the aggregate as
**mergeable partial state** (count, sum, min, max — each an algebraic
semigroup), aggregate ONLY the newly-arrived partition, and merge:

    state' = merge(state, partials(new_data))

The refresh cost becomes O(increment + |state|), independent of history
size. Exactness: count/sum/min/max merges are associative and commutative,
so any partition of the input into increments yields the same state as a
full recompute — the property the `incremental_rollup` query pins
cross-engine (merged halves == one-shot recompute, hash-exact).

Composition notes for other aggregates:
- avg/stddev: finalize from (count, sum, sum_sq) — never store the ratio;
- distinct: store a KMV sketch column (`operators/sketches.py`) — k-min
  hash arrays merge by array-union + re-truncate, same semigroup shape;
- percentiles: not algebraic — store a t-digest-style sketch or recompute.

Scale shape: `partials()` is ONE map-side-combinable aggregation of the
increment (shuffle keyed on group+window, combiner reduces each partition
to ≤ |groups×windows| rows before the exchange); `merge()` shuffles only
the two slim state tables, never raw data. Nothing collects on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Partial-state columns appended to the grouping keys.
STATE_COLS = ("cnt", "vsum", "vmin", "vmax")


def rollup_partials(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    *,
    granularity: str = "day",
) -> DataFrame:
    """Mergeable partial state of `value_col` per (key_cols, time bucket).

    Output: key_cols + `window_start` + (cnt, vsum, vmin, vmax). NULL
    values contribute to no state column (COUNT(col) semantics), matching
    what a full recompute would produce."""
    ws = F.date_trunc(granularity, F.col(ts_col)).alias("window_start")
    v = F.col(value_col)
    return df.groupBy(*key_cols, ws).agg(
        F.count(v).alias("cnt"),
        F.sum(v).alias("vsum"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )


def merge_rollup(*states: DataFrame) -> DataFrame:
    """Merge any number of partial-state tables (semigroup fold): counts
    and sums add, mins/maxes extremize. Associative + commutative, so
    increments may arrive in any order / any batching."""
    if not states:
        raise ValueError("merge_rollup needs at least one state table")
    acc = states[0]
    for s in states[1:]:
        acc = acc.unionByName(s)
    key_cols = [c for c in acc.columns if c not in STATE_COLS]
    return acc.groupBy(*key_cols).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("vsum").alias("vsum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def finalize_rollup(state: DataFrame, *, ndigits: int = 6) -> DataFrame:
    """Publish the consumer-facing view: derived aggregates (avg) computed
    from state at read time, floats rounded to `ndigits` so the result is
    invariant to the double-summation order the increment batching chose."""
    key_cols = [c for c in state.columns if c not in STATE_COLS]
    return state.select(
        *key_cols,
        F.col("cnt"),
        F.round("vsum", ndigits).alias("vsum"),
        F.col("vmin"),
        F.col("vmax"),
        F.round(F.col("vsum") / F.col("cnt"), ndigits).alias("vavg"),
    )
