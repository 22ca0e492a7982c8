"""Data-quality checks over lake tables — the "DQ checks" half of the
north star (metrics collection + DQ checks), as declarative one-pass
aggregations in the Deequ/dbt-test tradition.

Two surfaces:

- :func:`profile_table` — per-column completeness/cardinality profile.
- :func:`check_constraints` / :func:`check_referential` — named boolean
  constraints evaluated in ONE aggregation pass (violations counted via
  conditional sums, never one job per check); referential integrity is the
  exception (it inherently joins the parent table — a left-anti count).

Scale shape: `profile_table` is a single aggregation whose shuffle carries
one partial row per partition (map-side combined); with ``exact=False``
distinct counts ride HyperLogLog sketches in the same pass. A 100-check
constraint suite is still exactly one job over one scan of the table.
Results are DataFrames (one row per column/check) so suites compose with
the alerting/reporting operators like any other metric source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact: bool = True,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, null_ratio,
    n_distinct). ``exact=False`` swaps COUNT(DISTINCT) for HyperLogLog
    (one pass, ~2% error) — the 100 TB default; exact mode is the
    oracle-checkable contract at test scale. Null ratio is rounded to 6
    decimals (engine-stable)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"))
        aggs.append(
            (F.count_distinct(F.col(c)) if exact
             else F.approx_count_distinct(c)).alias(f"_ndv_{c}")
        )
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nulls_{c}").alias("n_nulls"),
            F.round(F.col(f"_nulls_{c}") / F.greatest(F.col("_n"), F.lit(1)), 6)
             .alias("null_ratio"),
            F.col(f"_ndv_{c}").alias("n_distinct"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def check_constraints(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level constraints in one pass.

    ``checks`` maps check name → boolean Column that should hold for EVERY
    row (null predicate results count as violations — an unknown is not a
    pass). Returns (check, n_violations, n_rows, passed), one row per
    check, stable check-name order.
    """
    if not checks:
        raise ValueError("check_constraints needs at least one check")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in checks.items():
        aggs.append(
            F.sum((~F.coalesce(pred, F.lit(False))).cast("long")).alias(f"_v_{name}")
        )
    row = df.agg(*aggs)
    per_check = [
        F.struct(
            F.lit(name).alias("check"),
            F.col(f"_v_{name}").alias("n_violations"),
            F.col("_n").alias("n_rows"),
            (F.col(f"_v_{name}") == 0).alias("passed"),
        )
        for name in checks
    ]
    return row.select(F.explode(F.array(*per_check)).alias("c")).select("c.*")


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Uniqueness as a DQ row: (check, n_violations, n_rows, passed) where
    violations = rows beyond the first per duplicate key group. A separate
    helper because uniqueness needs a groupBy, not a row predicate."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).alias("n_violations"),
            F.coalesce(F.sum("_c"), F.lit(0)).alias("n_rows"),
        )
    )
    return dup.select(
        F.lit("unique(" + ",".join(key_cols) + ")").alias("check"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def check_referential(
    child: DataFrame, parent: DataFrame, on: list[tuple[str, str]]
) -> DataFrame:
    """Referential integrity: child rows whose key has no parent match
    (left-anti count). ``on`` is [(child_col, parent_col), ...]. Null child
    keys count as violations (an orphan is an orphan)."""
    cond = None
    for c, p in on:
        eq = child[c] == parent[p]
        cond = eq if cond is None else (cond & eq)
    orphans = child.join(parent, cond, "left_anti")
    label = "references(" + ",".join(c for c, _ in on) + ")"
    return (
        orphans.agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(child.agg(F.count(F.lit(1)).alias("n_rows"))))
        .select(
            F.lit(label).alias("check"),
            "n_violations",
            "n_rows",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    *,
    bins: int = 20,
    min_val: float | None = None,
    max_val: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo, hi, n) for every
    NON-EMPTY bin, bin ∈ [0, bins) — the distribution view a DQ report or
    skew investigation reads next to ``profile_table``'s moments.

    Two-phase: bounds are either given (map-only single pass) or computed
    with one 1-row min/max aggregate that rides a crossJoin broadcast —
    never a driver collect. Values then bin map-side and one count
    aggregation keyed by bin (≤ ``bins`` groups) finishes.

    bin = least(bins-1, floor((x - min) / width)) — the last bin is closed
    so x = max lands in bins-1. Every arithmetic step is a single IEEE
    double op on identical inputs, so results are deterministic and
    cross-engine hash-exact; NULL values are excluded (they are
    ``profile_table``'s null_count, not a distribution point)."""
    x = F.col(value_col).cast("double")
    vals = df.filter(x.isNotNull()).select(x.alias("_x"))
    if min_val is not None and max_val is not None:
        bounds = vals.sparkSession.range(1).select(
            F.lit(float(min_val)).alias("_mn"), F.lit(float(max_val)).alias("_mx")
        )
    else:
        bounds = vals.agg(F.min("_x").alias("_mn"), F.max("_x").alias("_mx"))
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(bins))
    binned = (
        vals.crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor((F.col("_x") - F.col("_mn")) / width).cast("int"),
                )
            )
            .alias("bin"),
            F.col("_mn"),
            F.col("_mx"),
        )
    )
    return (
        binned.groupBy("bin", "_mn", "_mx")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "bin",
            (F.col("_mn") + F.col("bin") * (F.col("_mx") - F.col("_mn")) / bins)
            .alias("lo"),
            (F.col("_mn") + (F.col("bin") + 1) * (F.col("_mx") - F.col("_mn")) / bins)
            .alias("hi"),
            "n",
        )
    )


class ExpectationError(RuntimeError):
    """A DQ-gated write refused to land data; carries the failed checks."""

    def __init__(self, failures: list[dict]):
        self.failures = failures
        names = ", ".join(f["check"] for f in failures)
        super().__init__(f"expectations failed: {names}")


def write_with_expectations(
    df: DataFrame,
    path: str,
    checks: dict,
    *,
    mode: str = "append",
    partition_cols: list[str] | None = None,
    quarantine_path: str | None = None,
) -> DataFrame:
    """Expectation-gated landing: evaluate the constraint suite, and only
    if EVERY check passes, write `df` — the write-audit-publish pattern
    (bad batches must never become readable; a post-hoc DQ report on
    already-published data is an incident, not a gate).

    On failure raises :class:`ExpectationError` (the scheduler's retry/
    alert hook) after optionally landing the violating ROWS under
    `quarantine_path` (all rows failing any check, with a `failed_checks`
    column) — the triage artifact. Returns the check report either way
    it can (the report materializes BEFORE the write, one aggregation
    job; the data scan runs twice — once to check, once to write — by
    design: gating on a cached single pass would pin the whole batch in
    memory, and recomputation is the cheaper contract at lake scale).
    """
    report = check_constraints(df, checks)
    rows = report.collect()  # ≤ |checks| rows — bounded driver materialization
    failures = [r.asDict() for r in rows if not r["passed"]]
    if failures:
        if quarantine_path is not None:
            failed_checks = F.concat_ws(
                ",",
                *[
                    F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                    for name, pred in checks.items()
                ],
            )
            (
                df.withColumn("failed_checks", failed_checks)
                .filter(F.col("failed_checks") != "")
                .write.mode("overwrite")
                .parquet(quarantine_path)
            )
        raise ExpectationError(failures)
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
    return report


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    eps_ppm: int = 100,
) -> DataFrame:
    """Population Stability Index between a baseline and a current slice
    of `value_col` — THE standard distribution-drift gate for features
    and model scores (rule of thumb: <0.1 stable, 0.1–0.25 drifting,
    >0.25 act):

        PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

    over a FIXED [lo, hi) grid with under/overflow slots (the same
    grid-as-contract rule as `rollup.histogram_state`: comparing
    distributions on different grids is meaningless). Empty cells are
    floored at ``eps_ppm`` parts-per-million — the standard smoothing,
    made integer so both engines agree — because a 0-vs-something cell
    sends the log term to ±∞.

    Output: one row per bin slot (slot, base_n, cur_n, psi_term) plus the
    grand total row (slot = -1) — the per-bin terms ARE the diagnosis
    (which value range moved), the total is the gate. Exact integer
    counts; the p/q chain is identical IEEE both engines. An EMPTY base
    or current side yields NULL psi_term/total (no distribution to
    compare), never a fabricated finite PSI.

    Shape: two map-side-combined bin counts (slim), a ≤ bins+2-row join —
    neither input shuffles anything but bin ids.
    """
    if bins < 1 or not (hi > lo):
        raise ValueError("need bins >= 1 and hi > lo")
    width = (hi - lo) / bins

    def counts(df: DataFrame, name: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        slot = (
            F.when(v < lo, F.lit(0))
            .when(v >= hi, F.lit(bins + 1))
            .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)).cast("int") + 1)
        )
        return (
            df.filter(v.isNotNull())
            .groupBy(slot.alias("slot"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    b = counts(base, "base_n")
    c = counts(current, "cur_n")
    grid = b.sparkSession.range(0, bins + 2).select(
        F.col("id").cast("int").alias("slot")
    )
    joined = (
        grid.join(b, "slot", "left")
        .join(c, "slot", "left")
        .select(
            "slot",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    tb = joined.agg(
        F.sum("base_n").alias("_tb"), F.sum("cur_n").alias("_tc")
    )
    eps = F.lit(eps_ppm) / F.lit(1_000_000.0)
    wt = joined.crossJoin(F.broadcast(tb))
    # An EMPTY side has no distribution to compare against: x/0 is NULL
    # under non-ANSI Spark and greatest(NULL, eps) would silently floor
    # every cell to eps, fabricating a finite PSI. Gate each ratio on a
    # non-zero total so psi_term (and the slot=-1 sum) is NULL instead —
    # the same empty-batch-logs-NULL contract as streaming/drift.py.
    p = F.when(
        F.col("_tb") > 0, F.greatest(F.col("base_n") / F.col("_tb"), eps)
    )
    q = F.when(
        F.col("_tc") > 0, F.greatest(F.col("cur_n") / F.col("_tc"), eps)
    )
    terms = wt.select(
        "slot", "base_n", "cur_n",
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )
    total = terms.agg(
        F.lit(-1).alias("slot"),
        F.sum("base_n").alias("base_n"),
        F.sum("cur_n").alias("cur_n"),
        F.round(F.sum("psi_term"), 6).alias("psi_term"),
    )
    return terms.unionByName(total)
