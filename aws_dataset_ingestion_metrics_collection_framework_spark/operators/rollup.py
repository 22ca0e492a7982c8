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
- distinct: `distinct_state`/`merge_distinct_state`/`finalize_distinct`
  below — a KMV sketch column (k-min hash arrays merge by array-union +
  re-truncate, EXACTLY: unlike HLL, merged increments equal a one-shot
  build and the whole pipeline is oracle-checkable);
- percentiles: not algebraic exactly, but a FIXED-BIN histogram state is
  (bin counts add) — `histogram_state`/`merge_histograms`/
  `percentile_from_histogram` below give mergeable quantile estimates
  with error bounded by bin width, deterministic and oracle-exact
  (integer counts; the interpolation is one shared double chain).

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


def histogram_state(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 64,
    granularity: str = "day",
) -> DataFrame:
    """Mergeable fixed-bin histogram state per (key, window): `hist` is a
    ``bins + 2`` BIGINT array — [underflow, bin_0 … bin_{n-1}, overflow]
    — the percentile-capable companion to :func:`rollup_partials` (exact
    quantiles are not algebraic; bounded-error ones over a FIXED grid
    are: bin counts simply add). [lo, hi) must be chosen up front (from
    domain knowledge or a profiling pass) and NEVER change across
    increments — merging states with different grids is meaningless, so
    the grid is the caller's schema-level contract.

    One map-side-combinable aggregation; bin index is a codegen'd
    floor((x−lo)/width) both engines compute identically."""
    if bins < 1 or not (hi > lo):
        raise ValueError("need bins >= 1 and hi > lo")
    width = (hi - lo) / bins
    ws = F.date_trunc(granularity, F.col(ts_col)).alias("window_start")
    v = F.col(value_col).cast("double")
    idx = F.when(v < lo, F.lit(0)).when(v >= hi, F.lit(bins + 1)).otherwise(
        F.floor((v - F.lit(lo)) / F.lit(width)).cast("int") + 1
    )
    counted = (
        df.filter(v.isNotNull())
        .groupBy(*key_cols, ws, idx.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # scatter the ≤ bins+2 per-group rows into the dense array
    slots = F.sequence(F.lit(0), F.lit(bins + 1))
    return (
        counted.groupBy(*key_cols, "window_start")
        .agg(F.map_from_entries(F.collect_list(F.struct("_b", "_c"))).alias("_m"))
        .select(
            *key_cols,
            "window_start",
            F.transform(
                # _m is keyed by the slot id itself (element_at on a MAP
                # is a key lookup, not 1-based indexing)
                slots, lambda i: F.coalesce(F.element_at("_m", i), F.lit(0))
            ).alias("hist"),
        )
    )


def merge_histograms(*states: DataFrame) -> DataFrame:
    """Histogram-state merge: element-wise sum (the semigroup again) —
    all inputs must share the SAME [lo, hi, bins] grid (caller contract,
    see :func:`histogram_state`)."""
    if not states:
        raise ValueError("merge_histograms needs at least one state table")
    acc = states[0]
    for s in states[1:]:
        acc = acc.unionByName(s)
    key_cols = [c for c in acc.columns if c != "hist"]
    return acc.groupBy(*key_cols).agg(
        F.reduce(
            F.collect_list("hist"),
            F.transform(F.first("hist"), lambda x: F.lit(0).cast("bigint")),
            lambda a, h: F.zip_with(a, h, lambda x, y: x + y),
        ).alias("hist")
    )


def percentile_from_histogram(
    state: DataFrame, p_pct: int, *, lo: float, hi: float
) -> DataFrame:
    """Percentile estimate from a histogram state: the value at the
    cumulative-count crossing, linearly interpolated inside the crossing
    bin — error ≤ one bin width. Same [lo, hi] grid as the build
    (caller contract). Underflow/overflow crossings clamp to lo/hi.
    Adds ``p{p_pct}`` (double, 6 digits).

    Implementation is RELATIONAL — posexplode the slots, one window
    cumulative sum, min crossing slot — not a per-row HOF cumulative:
    the nested `transform(aggregate(slice(...)))` formulation is
    O(bins²) generated code PER ROW and measured ~13 s of pure
    expression/codegen overhead at 202 slots (flat across data sizes,
    but a fixed tax every caller pays). The window runs over ≤ bins+2
    rows per state row — grid-sized, not data-sized."""
    from pyspark.sql import Window

    if not (0 < p_pct < 100):
        raise ValueError("p_pct must be in (0, 100)")
    key_cols = [c for c in state.columns if c != "hist"]
    ex = state.select(
        *key_cols,
        F.size("hist").alias("_w"),
        F.posexplode("hist").alias("_slot", "_c"),
    )
    wcum = (
        Window.partitionBy(*key_cols)
        .orderBy("_slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ex = ex.withColumn("_cum", F.sum("_c").over(wcum))
    totals = ex.groupBy(*key_cols).agg(F.max("_cum").alias("_n"))
    target = F.floor((F.col("_n") * p_pct + F.lit(99)) / 100).cast("bigint")
    crossing = (
        ex.join(totals, key_cols)
        .withColumn("_target", target)
        .filter((F.col("_n") > 0) & (F.col("_cum") >= F.col("_target")))
        .groupBy(*key_cols)
        .agg(
            F.min_by(
                F.struct("_slot", "_c", "_cum", "_w", "_n", "_target"), F.col("_slot")
            ).alias("_x")
        )
        .select(*key_cols, "_x.*")
    )
    nbins = F.col("_w") - 2
    width = (F.lit(hi) - F.lit(lo)) / nbins
    frac = F.when(
        F.col("_c") > 0,
        (F.col("_target") - (F.col("_cum") - F.col("_c"))) / F.col("_c"),
    ).otherwise(F.lit(0.0))
    est = (
        F.when(F.col("_slot") <= 0, F.lit(lo))
        .when(F.col("_slot") >= nbins + 1, F.lit(hi))
        .otherwise(F.lit(lo) + (F.col("_slot") - 1 + frac) * width)
    )
    pcol = crossing.select(
        *key_cols, F.round(est, 6).alias(f"p{p_pct}")
    )
    return state.join(pcol, key_cols, "left")


def distinct_state(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    *,
    k: int = 256,
    granularity: str = "day",
) -> DataFrame:
    """Mergeable distinct-count state per (key, window): a KMV sketch
    column (`kmv` = the k smallest distinct 60-bit md5 hashes of the
    value, sorted) — the distinct-count companion to
    :func:`rollup_partials` (COUNT(DISTINCT) is not algebraic; k-minimum
    values are: the k smallest of a union is computable from the k
    smallest of each part, EXACTLY — so merged increments equal a
    one-shot build, unlike HLL whose register merge order is
    engine-internal).

    Scale shape: one slim distinct on (keys, window, hash), then the
    engine's bin-thresholded exact top-k (`curation.top_k_by_value`)
    keeps only ~k rows per group before any sort — per-group distinct
    hashes never pile into one task. Estimator (see
    `operators/sketches.py`): exact below k, (k−1)·2⁶⁰/h_(k) above.
    """
    from ..operators.curation import top_k_by_value
    from ..operators.dedup import md5_60bit

    ws = F.date_trunc(granularity, F.col(ts_col)).alias("window_start")
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*key_cols, ws, md5_60bit(F.col(value_col).cast("string")).alias("_h"))
        .distinct()
    )
    topk = top_k_by_value(
        d, [*key_cols, "window_start"], "_h", k,
        tiebreak_col="_h", descending=False,
    )
    return (
        topk.groupBy(*key_cols, "window_start")
        .agg(F.array_sort(F.collect_list("_h")).alias("kmv"))
    )


def merge_distinct_state(*states: DataFrame, k: int = 256) -> DataFrame:
    """KMV merge: k smallest of the union of sketches — exact (each
    sketch already holds its part's k smallest, so the union's k
    smallest are all present). Same grid-as-contract rule: every input
    must have been built with the same k and hash."""
    if not states:
        raise ValueError("merge_distinct_state needs at least one state")
    acc = states[0]
    for s in states[1:]:
        acc = acc.unionByName(s)
    key_cols = [c for c in acc.columns if c != "kmv"]
    return acc.groupBy(*key_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1,
            k,
        ).alias("kmv")
    )


def finalize_distinct(state: DataFrame, *, k: int = 256) -> DataFrame:
    """Distinct-count estimate from the sketch: exact when the sketch
    holds fewer than k values (it IS the distinct set then), else the
    unbiased KMV estimator (k−1)·2⁶⁰/h_(k) — identical IEEE both
    engines (2⁶⁰ is a power of two). Adds ``est_distinct`` (rounded 6)
    and ``n_sketch``."""
    two60 = float(1 << 60)
    n = F.size("kmv")
    hk = F.element_at("kmv", k).cast("double")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(two60) / hk
    )
    return state.select(
        *[c for c in state.columns if c != "kmv"],
        n.alias("n_sketch"),
        F.round(est, 6).alias("est_distinct"),
    )
