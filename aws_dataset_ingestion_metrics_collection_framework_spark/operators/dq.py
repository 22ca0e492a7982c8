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
