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
