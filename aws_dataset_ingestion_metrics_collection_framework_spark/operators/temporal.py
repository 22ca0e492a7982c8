"""Temporal joins the built-in DataFrame surface lacks: as-of (most recent
prior observation) and range/bucket assignment.

Both are expressed as compositions of existing operators (the brief's
preferred strategy for custom operators), picked for their 100 TB plans:

- ``as_of_join``: the naive formulation is a range join (l.ts >= r.ts →
  max) whose join volume explodes with per-key history length. This one is
  the union+window formulation: tag both sides, union, one shuffle on the
  key, and a running ``last(value, ignorenulls)`` carries each right-side
  observation forward to the left rows that follow it. Cost is a single
  sort-shuffle of |L|+|R| rows — linear, skew handled by AQE, no
  backward-looking join at all.
- ``range_bucket_join``: non-equi containment against a SMALL boundary
  table — forced broadcast so Catalyst picks BroadcastNestedLoopJoin
  (each row scans B boundaries map-side) instead of a shuffled cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right observation with
    ``right.ts <= left.ts`` for the same ``on`` key (inclusive, like DuckDB
    ASOF JOIN); ``asof_ts`` carries the matched observation time and the
    value columns come back suffixed ``_asof`` (NULL when no prior
    observation, or when older than ``tolerance_seconds``).

    Determinism contract: ``right`` must be unique per (key, ts) —
    pre-aggregate duplicates (e.g. MAX per key+ts) before calling, exactly
    as an ASOF JOIN oracle requires.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.col(right_ts).alias("_asof_ts"),
        *[F.col(c).alias(f"{c}_asof") for c in value_cols],
    ).withColumn("_is_left", F.lit(0))
    tagged_l = left.withColumn("_is_left", F.lit(1))
    u = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    # right rows sort before left rows at the same timestamp → inclusive
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(f"{c}_asof", ignorenulls=True).over(w).alias(f"{c}_asof") for c in value_cols]
    asof_ts = F.last("_asof_ts", ignorenulls=True).over(w).alias("asof_ts")
    out = (
        u.select(*left.columns, "_is_left", asof_ts, *carried)
        .filter(F.col("_is_left") == 1)
        .drop("_is_left")
    )
    if tolerance_seconds is not None:
        stale = (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("asof_ts"))
        ) > tolerance_seconds * 1_000_000
        out = out.select(
            *left.columns,
            F.when(stale, F.lit(None)).otherwise(F.col("asof_ts")).alias("asof_ts"),
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}_asof")).alias(f"{c}_asof")
                for c in value_cols
            ],
        )
    return out


def range_bucket_join(
    df: DataFrame,
    buckets: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Assign each row the bucket whose [lo, hi) contains ``value_col``.

    ``buckets`` must be small (boundary tables are); it is explicitly
    broadcast so the non-equi condition executes as a map-side
    BroadcastNestedLoopJoin — the scalable physical plan for containment
    joins against a dimension of boundaries. Rows outside every bucket are
    kept with NULL bucket columns (left join).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return df.join(F.broadcast(buckets), cond, "left")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_source: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with manual key salting for pathologically skewed keys.

    AQE's skew-join split handles most imbalance at runtime; this is the
    explicit variant for keys so hot that even split partitions overwhelm a
    task (the classic power-law join key). The big side spreads each key
    over ``n_salts`` sub-keys via a DETERMINISTIC salt — ``pmod(xxhash64(
    salt_source), n)`` of a caller-named column, never a random() that
    breaks task-retry idempotence — and the small side replicates each row
    n_salts times, so every (key, salt) pair finds its match. Output equals
    the plain join exactly; shuffle skew drops by ~n_salts.

    Only ``inner``/``left``/``left_semi`` are accepted: the small side is
    replicated n_salts times, so join types that emit unmatched small-side
    rows (right/full outer, left_anti reversed) would emit each such row
    n_salts times — a silent correctness break, hence a loud ValueError.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports how='inner'/'left'/'left_semi' only, got "
            f"{how!r}: replicated small-side rows would duplicate unmatched "
            f"output under right/full join types"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    l_id: str,
    l_start: str,
    l_end: str,
    r_id: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    by: list[str] | None = None,
) -> DataFrame:
    """All pairs of overlapping half-open intervals [start, end) — the
    interval/overlap join Spark's optimizer turns into a cross product when
    written naively (`l.start < r.end AND r.start < l.end` has no equi
    component to hash on).

    Grid bucketing recovers an equi-join: every interval explodes to the
    ``bucket_width``-sized grid cells it touches, candidates pair on the
    cell (+ optional ``by`` equi-keys — most real overlap joins also match
    on an entity key), dedup to distinct (l_id, r_id), verify the exact
    overlap predicate. Cost is Σ cells-per-interval join rows — pick
    bucket_width near the typical interval length so most intervals touch
    1-2 cells; a single cell's population bounds the worst-case pairing,
    exactly the LSH-bucket economics the dedup family uses.

    Interval bounds must be integers (cast timestamps to epoch micros
    first). Returns (by..., l_id, r_id, l_start, l_end, r_start, r_end).
    """
    by = by or []

    def cells(df, id_c, s_c, e_c, side):
        return df.select(
            *[F.col(c) for c in by],
            F.col(id_c).alias(f"{side}_id"),
            F.col(s_c).cast("long").alias(f"{side}_s"),
            F.col(e_c).cast("long").alias(f"{side}_e"),
            F.explode(
                F.sequence(
                    F.floor(F.col(s_c).cast("long") / bucket_width),
                    # last cell containing a point of [s, e): cell of e-1
                    F.floor((F.col(e_c).cast("long") - 1) / bucket_width),
                )
            ).alias("_cell"),
        )

    lc = cells(left.filter(F.col(l_start) < F.col(l_end)), l_id, l_start, l_end, "l")
    rc = cells(right.filter(F.col(r_start) < F.col(r_end)), r_id, r_start, r_end, "r")
    on = ["_cell", *by]
    pairs = (
        lc.join(rc, on)
        .filter((F.col("l_s") < F.col("r_e")) & (F.col("r_s") < F.col("l_e")))
        .select(*by, "l_id", "r_id", "l_s", "l_e", "r_s", "r_e")
        # an overlapping pair shares every cell of its overlap region —
        # dedup the per-cell multiplicity
        .distinct()
    )
    return pairs.select(
        *by,
        F.col("l_id").alias(l_id + "_l") if l_id == r_id else F.col("l_id").alias(l_id),
        F.col("r_id").alias(r_id + "_r") if l_id == r_id else F.col("r_id").alias(r_id),
        F.col("l_s").alias(l_start + "_l") if l_start == r_start else F.col("l_s").alias(l_start),
        F.col("l_e").alias(l_end + "_l") if l_end == r_end else F.col("l_e").alias(l_end),
        F.col("r_s").alias(r_start + "_r") if l_start == r_start else F.col("r_s").alias(r_start),
        F.col("r_e").alias(r_end + "_r") if l_end == r_end else F.col("r_e").alias(r_end),
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    step: str = "1 hour",
    truncate_to: str = "hour",
) -> DataFrame:
    """Resample an irregular per-key time series onto a regular grid with
    forward fill (last observation carried forward) — the
    metrics-dashboard/feature-store alignment step: every series gets one
    row per grid tick from its first observation's truncated timestamp to
    its last, valued at the most recent observation at-or-before the tick.

    Implementation is the as-of-join trick without a join: grid ticks and
    observations UNION into one stream, one window pass per key carries
    the last non-null value forward (observations sort before a tick at
    the same timestamp, so a tick ON an observation takes it), and only
    tick rows come back out. One shuffle keyed by the series; the window
    sorts each series independently — parallelism = #series, exactly how
    the data grows. Ties inside a timestamp resolve by value (total order,
    engine-independent).

    Ticks before a series' first observation yield NULL (nothing to carry);
    callers choosing zero-fill/interpolation handle that downstream — the
    operator never invents values.
    """
    key, ts = F.col(key_col), F.col(ts_col)
    obs = df.select(
        key.alias("_k"),
        ts.alias("_ts"),
        F.col(value_col).alias("_v"),
        F.lit(1).alias("_is_obs"),
    )
    grid = (
        df.groupBy(key.alias("_k"))
        .agg(
            F.date_trunc(truncate_to, F.min(ts)).alias("_lo"),
            F.max(ts).alias("_hi"),
        )
        .select(
            "_k",
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"interval {step}"))
            ).alias("_ts"),
        )
        .select("_k", "_ts", F.lit(None).cast("double").alias("_v"),
                F.lit(0).alias("_is_obs"))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.desc("_is_obs"), F.col("_v"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        obs.unionByName(grid)
        .withColumn("_f", F.last("_v", ignorenulls=True).over(w))
        .filter(F.col("_is_obs") == 0)
        .select(
            F.col("_k").alias(key_col),
            F.col("_ts").alias(ts_col),
            F.col("_f").alias(value_col),
        )
    )
