"""Distribution diagnostics: key-skew profiling for shuffle planning.

Skewed join/aggregation keys are the #1 cause of straggler tasks at
100 TB: one hot key serializes an entire stage. Before picking a
mitigation — ``temporal.salted_join``, ``dedup.cap_bucket_size``, AQE
skew-join — you need to SEE the skew. These operators produce that
evidence as plain DataFrames (small enough to collect/alert on), never
pulling raw rows to the driver: the per-key counts are one
map-side-combinable aggregation, and the summary is an aggregation over
the (much smaller) count table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def key_histogram(df: DataFrame, key_cols: list[str], *, top_n: int = 20) -> DataFrame:
    """Top-``top_n`` heaviest keys with counts and share of total rows —
    the keys a salting/capping decision targets. One count aggregation +
    a single-partition top-N (top_n rows, not the corpus)."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_t"), 6).alias("row_share"),
        )
        .orderBy(F.desc("n_rows"), *key_cols)
        .limit(top_n)
    )


def mad_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    k: float = 3.5,
) -> DataFrame:
    """Robust per-series outlier flags: |x − median| / MAD > k (the
    median-absolute-deviation rule — unlike z-scores, the estimator itself
    is not dragged by the outliers it hunts; k=3.5 ≈ the classic
    modified-z-score cutoff with the 0.6745 consistency constant folded
    into the caller's choice of k).

    Health-monitoring usage: run over metric datapoints per series to flag
    broken-feed spikes that threshold alarms (absolute bounds) miss.

    Two grouped aggregations (median, then MAD around it) + a broadcast-
    friendly join back; series with MAD = 0 (constant value) flag only
    exact deviators as outliers (score = infinity convention avoided by a
    0-MAD guard: any deviation from a constant series is anomalous).
    Returns the input plus (series_median, series_mad, is_outlier).
    """
    med = df.groupBy(*key_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("series_median")
    )
    dev = (
        df.join(med, key_cols)
        .withColumn("_absdev", F.abs(F.col(value_col) - F.col("series_median")))
    )
    mad = dev.groupBy(*key_cols).agg(
        F.expr("percentile(_absdev, 0.5)").alias("series_mad")
    )
    return (
        dev.join(mad, key_cols)
        .withColumn(
            "is_outlier",
            F.when(F.col("series_mad") > 0, F.col("_absdev") / F.col("series_mad") > k)
            .otherwise(F.col("_absdev") > 0),
        )
        .drop("_absdev")
    )


def skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """One-row skew summary over the per-key count distribution:

    - ``n_keys`` / ``n_rows``: cardinality and volume;
    - ``max_count`` / ``avg_count`` and their ratio ``skew_factor`` — the
      straggler multiplier a hash-partitioned shuffle on this key suffers
      (a perfectly uniform key has skew_factor ≈ 1);
    - ``p50_count`` / ``p99_count``: the count distribution's shape
      (exact percentiles — the count table is one row per key, small).

    Rule of thumb: skew_factor beyond the per-stage task count means the
    hot key alone outlasts the rest of the stage combined — salt it.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_count"),
        F.round(F.avg("n"), 6).alias("avg_count"),
        F.round(F.max("n") / F.avg("n"), 6).alias("skew_factor"),
        F.expr("percentile(n, 0.5)").alias("p50_count"),
        F.expr("percentile(n, 0.99)").alias("p99_count"),
    )


def seasonal_outliers(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    *,
    season: str = "hour",
    k: float = 3.0,
    scale_bits: int = 10,
) -> DataFrame:
    """Seasonality-aware anomaly flags: each value is scored against the
    mean/stddev of its OWN seasonal slot (per key × hour-of-day by
    default) — the detector for loads with a daily/weekly pulse, where a
    global threshold (or `mad_outliers`' global median) flags every rush
    hour as anomalous and misses a quiet-hour spike entirely.

    ``season``: 'hour' (0-23), 'dow' (1-7), or 'hour_dow' (the 168-slot
    weekly grid). z-scores use population stddev over the slot.

    Cross-engine-exact by the engine's integer-sum recipe (see
    `similarity.zscore_embeddings`): values quantize to ``2^scale_bits``
    fixed-point BIGINTs (power-of-two scale: the multiply is exact in
    double; away-from-zero tie rounding agrees between engines), slot
    Σx/Σx² are exact integer sums, and the z chain is identical IEEE
    both sides. Bounds: |value|·2^bits must fit comfortably and
    n·(value·2^bits)² stay under 2⁶³ — at the default 10 bits that is
    ~3e9 magnitude / ~9e18 sum-of-squares, raise/lower ``scale_bits``
    per column magnitude.

    Shape: one map-side-combined aggregate onto the (keys × slots) grid,
    grid broadcast back, map-only scoring — same discipline as DSIR's
    256-bucket grid; the event table never shuffles.
    """
    ts = F.col(ts_col)
    if season == "hour":
        slot = F.hour(ts)
    elif season == "dow":
        slot = F.dayofweek(ts)
    elif season == "hour_dow":
        slot = F.dayofweek(ts) * 100 + F.hour(ts)
    else:
        raise ValueError(f"unknown season {season!r}")
    scale = float(1 << scale_bits)
    xi = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast("bigint")
    base = df.withColumn("_slot", slot).withColumn("_xi", xi)
    grid = base.filter(F.col("_xi").isNotNull()).groupBy(*key_cols, "_slot").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_xi").alias("_s"),
        F.sum(F.col("_xi") * F.col("_xi")).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = F.col("_ss").cast("double") / F.col("_n") - mean * mean
    grid = grid.select(
        *key_cols, "_slot",
        mean.alias("_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_std"),
    )
    dev = F.abs(F.col("_xi").cast("double") - F.col("_mean"))
    is_out = F.when(
        F.col("_std") > 0.0, dev / F.col("_std") > F.lit(float(k))
    ).otherwise(dev > 0.0)
    return (
        base.join(F.broadcast(grid), [*key_cols, "_slot"])
        .select(
            *df.columns,
            F.col("_slot").alias("season_slot"),
            F.round(F.col("_mean") / F.lit(scale), 6).alias("seasonal_mean"),
            F.round(F.col("_std") / F.lit(scale), 6).alias("seasonal_std"),
            is_out.alias("is_outlier"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    *,
    slack_k: float = 0.5,
    threshold_k: float = 5.0,
    scale_bits: int = 10,
) -> DataFrame:
    """Per-series CUSUM drift detection (Page 1954): flags sustained mean
    SHIFTS that point anomalies slip past — ten straight readings 1.5σ
    high never trip a 3σ rule, but their cumulative drift trips CUSUM
    fast. The standard two-sided scheme with slack ``slack_k·σ`` and
    decision threshold ``threshold_k·σ``.

    The textbook recursion s_t = max(0, s_{t-1} + d_t) looks
    row-iterative, but has the closed form s_t = P_t − min(0, min_{j≤t}
    P_j) over prefix sums P — so the whole detector is TWO window
    functions per direction (running sum + running min), no recursion,
    no per-series collect: shuffle once per series key, scan in order.
    Reference mean/σ per series use the engine's integer-quantization
    recipe (exact, cross-engine; see `seasonal_outliers` for bounds).

    ``order_cols`` (default [ts_col]) must totally order each series —
    a tie would make the running sums partition-order-dependent.

    Output: input columns + cusum_hi/cusum_lo (σ units, 6 digits) +
    is_changepoint. Self-referential baseline caveat: mean/σ come from
    the WHOLE series including post-shift data — fine for detection;
    for clean localization re-run with a reference window's stats.
    """
    from pyspark.sql import Window

    order_cols = order_cols or [ts_col]
    scale = float(1 << scale_bits)
    xi = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast("bigint")
    base = df.withColumn("_xi", xi)
    stats = base.groupBy(*key_cols).agg(
        F.count("_xi").alias("_n"),
        F.sum("_xi").alias("_s"),
        F.sum(F.col("_xi") * F.col("_xi")).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = F.col("_ss").cast("double") / F.col("_n") - mean * mean
    stats = stats.select(
        *key_cols, "_n", "_s",
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_std"),
    )
    # Integer CUSUM units: deviations scaled by n (dev_u = xi·n − Σx, an
    # exact integer — no mean division) and the slack/threshold rounded
    # ONCE to those units. Running window sums of DOUBLES are engine-
    # implementation-dependent (sequential accumulator vs segment-tree
    # reduction order); integer prefix sums are order-free, so the whole
    # detector is bit-stable cross-engine. Bound: |value|·2^bits · n ·
    # series_len must stay under 2⁶³ (≈10⁶-row series at default scale).
    stats = stats.withColumn(
        "_slack_u",
        F.round(F.lit(float(slack_k)) * F.col("_std") * F.col("_n") * F.lit(scale))
        .cast("bigint"),
    ).withColumn(
        "_h_u",
        F.round(F.lit(float(threshold_k)) * F.col("_std") * F.col("_n") * F.lit(scale))
        .cast("bigint"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = base.join(F.broadcast(stats), list(key_cols))
    dev_u = (F.col("_xi") * F.col("_n") - F.col("_s")) * F.lit(1 << scale_bits)
    d_hi = dev_u - F.col("_slack_u")
    d_lo = -dev_u - F.col("_slack_u")
    zero = F.lit(0).cast("bigint")
    p_hi = F.sum(d_hi).over(w)
    p_lo = F.sum(d_lo).over(w)
    s_hi = p_hi - F.least(zero, F.min(p_hi).over(w))
    s_lo = p_lo - F.least(zero, F.min(p_lo).over(w))
    sigma = F.col("_std")
    # σ units for reporting: s carries value·2^(2b)·n units, σ (over the
    # quantized xi) carries value·2^b — divide by σ·n·2^b
    norm = F.when(sigma > 0.0, sigma).otherwise(F.lit(1.0)) * F.col("_n") * F.lit(scale)
    return joined.select(
        *df.columns,
        F.round(s_hi.cast("double") / norm, 6).alias("cusum_hi"),
        F.round(s_lo.cast("double") / norm, 6).alias("cusum_lo"),
        (
            F.when(
                sigma > 0.0, (s_hi > F.col("_h_u")) | (s_lo > F.col("_h_u"))
            ).otherwise(F.lit(False))
        ).alias("is_changepoint"),
    )


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square statistic for independence of two categorical
    columns — the "is segment related to outcome" screen (feature
    selection, A/B sanity, bias audits). Returns ONE row: (chi2, dof,
    n_rows, n_a, n_b); compare chi2 against the χ² critical value for
    dof at your α (the CDF itself is a table lookup, not an engine op).

    Exact arithmetic: observed and marginal counts are integers; the
    statistic Σ (O − E)²/E with E = row_total·col_total/N is one shared
    double chain over those integers (rounded 6). Rows with NULL in
    either column are excluded (a NULL category is a data-quality
    question for `profile_table`, not a category).

    Shape: one (a, b) contingency aggregation (map-side combined; cell
    count = |A|×|B| — categorical by assumption), two marginal
    re-aggregations of the CELL table (not the data), a 1-row total.
    """
    filtered = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = filtered.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_o"))
    ra = cells.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    cb = cells.groupBy("_b").agg(F.sum("_o").alias("_cb"))
    tot = cells.agg(
        F.sum("_o").alias("_n"),
        F.countDistinct("_a").alias("_na"),
        F.countDistinct("_b").alias("_nb"),
    )
    e = F.col("_ra").cast("double") * F.col("_cb") / F.col("_n")
    term = (F.col("_o") - e) * (F.col("_o") - e) / e
    return (
        cells.join(ra, "_a")
        .join(cb, "_b")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(term), 6).alias("chi2"),
            F.max((F.col("_na") - 1) * (F.col("_nb") - 1)).cast("long").alias("dof"),
            F.max("_n").alias("n_rows"),
            F.max("_na").cast("long").alias("n_a"),
            F.max("_nb").cast("long").alias("n_b"),
        )
    )


def correlation_matrix(
    df: DataFrame, cols: list[str], *, scale_bits: int = 10
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns — the feature
    redundancy/leakage screen. One pass computes every Σx, Σx² and Σxy
    (map-side combined; rows with a NULL in ANY of `cols` are excluded so
    all pairs share one n — the listwise-deletion convention).

        r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    over 2^scale_bits-quantized integers (the engine's exactness recipe:
    integer sums are order-free; the r chain is identical IEEE both
    engines). Bounds: n·(x·2^bits)·(y·2^bits) must stay under 2⁶³ —
    size scale_bits to the column magnitudes. Constant columns yield
    NULL r (undefined, not 0). Output: (col_x, col_y, n, r) per
    unordered pair, col_x < col_y by the input order.
    """
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs at least two columns")
    scale = float(1 << scale_bits)
    filtered = df
    for c in cols:
        filtered = filtered.filter(F.col(c).isNotNull())
    q = {
        c: F.round(F.col(c).cast("double") * F.lit(scale)).cast("bigint")
        for c in cols
    }
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(q[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(q[c] * q[c]).alias(f"_ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(q[a] * q[b]).alias(f"_sxy_{a}_{b}"))
    stats = filtered.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            # the n·Σ products overflow int64 at modest sizes — compute in
            # double FROM the exact integer sums (int64→double casts are
            # correctly-rounded IEEE in both engines, so identical inputs
            # give identical chains)
            n_d = F.col("_n").cast("double")
            sxy = F.col(f"_sxy_{a}_{b}").cast("double")
            sa, sb = F.col(f"_s_{a}").cast("double"), F.col(f"_s_{b}").cast("double")
            ssa, ssb = F.col(f"_ss_{a}").cast("double"), F.col(f"_ss_{b}").cast("double")
            num = n_d * sxy - sa * sb
            va = n_d * ssa - sa * sa
            vb = n_d * ssb - sb * sb
            r = F.when(
                (va > 0) & (vb > 0),
                F.round(num / F.sqrt(va * vb), 6),
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    F.col("_n").alias("n"),
                    r.alias("r"),
                )
            )
    return stats.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")
