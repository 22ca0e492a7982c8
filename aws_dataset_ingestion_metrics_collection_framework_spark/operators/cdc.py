"""Change-data-capture snapshot operators: upsert-latest and merge.

A 100 TB lake ingests mutable entities as append-only changelogs (the only
write pattern object storage does well); consumers need the *current
snapshot* — latest version per key, tombstones applied. The reference
framework's ingest is exactly such an append stream (Kinesis put_records →
Firehose parquet, SURVEY.md §2.1 S4/S5); these operators add the standard
compaction step downstream systems run over it.

Shape: ONE shuffle keyed on the entity key, `max_by` over a (seq...) struct
— no window, no sort, map-side combinable (each partition keeps one
candidate row per key before the exchange). That is the plan you want at
scale: a window `row_number` formulation shuffles every version of every
key to sort it, while max_by reduces versions inside the map task.

Ties: `seq_cols` must totally order versions within a key (e.g. a
timestamp plus a change-log sequence id); struct comparison is
lexicographic in the given column order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def upsert_latest(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    *,
    delete_predicate: Column | None = None,
) -> DataFrame:
    """Latest-version snapshot of an append-only changelog.

    Keeps, per `key_cols` group, the row with the greatest `seq_cols`
    (lexicographic struct order), then drops keys whose latest row
    satisfies `delete_predicate` (tombstone applied AFTER versioning: a
    delete followed by a later upsert resurrects the key, matching MERGE
    semantics). Output columns = input columns, one row per live key.
    """
    row = F.struct(*[F.col(c) for c in changes.columns])
    seq = F.struct(*[F.col(c) for c in seq_cols])
    snap = (
        changes.groupBy(*key_cols)
        .agg(F.max_by(row, seq).alias("_r"))
        .select("_r.*")
    )
    if delete_predicate is not None:
        snap = snap.filter(~delete_predicate)
    return snap


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    *,
    delete_predicate: Column | None = None,
) -> DataFrame:
    """MERGE a change batch into an existing snapshot (same schema):
    union then :func:`upsert_latest` — a base row wins only when no change
    with a greater sequence touches its key. Idempotent under replayed
    change batches (max_by of a superset is unchanged)."""
    return upsert_latest(
        base.unionByName(changes), key_cols, seq_cols,
        delete_predicate=delete_predicate,
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff of two same-schema snapshots: which keys were
    inserted, deleted, or updated between them — the validation step every
    CDC pipeline runs (does replaying the changelog reproduce yesterday's
    snapshot?) and the primitive behind incremental-sync auditing.

    Output: `key_cols` + `change_type` ('insert' | 'delete' | 'update')
    + `changed_cols` (comma-joined names of compare columns whose value
    differs, '' for insert/delete — the column-level blame an auditor
    reads). Unchanged keys are dropped unless `include_unchanged`.

    Scale shape: ONE full outer shuffle join on the key — both sides
    exchange on `key_cols` and never again; per-column comparison happens
    post-join inside codegen (null-safe `<=>`, so NULL→value and
    value→NULL both count as changes). At 100 TB both snapshots would be
    bucketed on the key (`sources/bucketed.py`) making this exchange-free;
    nothing here collects or iterates on the driver.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]
    o = old.select(*key_cols, F.struct(*compare_cols).alias("_o"))
    n = new.select(*key_cols, F.struct(*compare_cols).alias("_n"))
    j = o.join(n, on=key_cols, how="full_outer")
    # concat_ws skips NULL args in both Spark and ANSI SQL, so the CASE
    # chain yields a stable comma-joined changed-column list.
    changed = F.concat_ws(
        ",",
        *[
            F.when(~F.col(f"_o.{c}").eqNullSafe(F.col(f"_n.{c}")), F.lit(c))
            for c in compare_cols
        ],
    )
    out = j.select(
        *key_cols,
        F.when(F.col("_o").isNull(), F.lit("insert"))
        .when(F.col("_n").isNull(), F.lit("delete"))
        .when(
            ~F.col("_o").eqNullSafe(F.col("_n")), F.lit("update")
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.when(
            F.col("_o").isNotNull() & F.col("_n").isNotNull(), changed
        )
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type-2 view of a changelog: every version
    row gains `valid_from` (its own leading sequence value), `valid_to`
    (the next version's, null while current) and `is_current`. Ordering
    uses ALL of `seq_cols` (deterministic under equal timestamps when a
    unique change id follows); the validity bounds are the leading column.
    One shuffle (window by key); versions stay distributed — no collect, no
    per-key iteration."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*seq_cols)
    bound = seq_cols[0]
    return (
        changes.withColumn("valid_from", F.col(bound))
        .withColumn("valid_to", F.lead(bound).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
