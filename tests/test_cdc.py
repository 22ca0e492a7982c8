"""CDC snapshot operator tests: upsert-latest, merge, SCD2 history."""

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.cdc import (
    apply_changes,
    scd2_history,
    upsert_latest,
)

SCHEMA = "k long, seq long, op string, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_upsert_latest_keeps_latest_version(spark):
    log = _df(spark, [
        (1, 1, "U", "a"), (1, 3, "U", "c"), (1, 2, "U", "b"),
        (2, 1, "U", "x"),
    ])
    snap = {r["k"]: r["v"] for r in upsert_latest(log, ["k"], ["seq"]).collect()}
    assert snap == {1: "c", 2: "x"}


def test_tombstone_applied_after_versioning(spark):
    log = _df(spark, [
        (1, 1, "U", "a"), (1, 2, "D", None),          # deleted, stays dead
        (2, 1, "U", "x"), (2, 2, "D", None), (2, 3, "U", "y"),  # resurrected
    ])
    snap = upsert_latest(log, ["k"], ["seq"], delete_predicate=F.col("op") == "D")
    rows = {r["k"]: r["v"] for r in snap.collect()}
    assert rows == {2: "y"}


def test_seq_tiebreak_uses_later_columns(spark):
    log = spark.createDataFrame(
        [(1, 5, 1, "first"), (1, 5, 2, "second")], "k long, ts long, sub long, v string"
    )
    snap = upsert_latest(log, ["k"], ["ts", "sub"])
    assert snap.collect()[0]["v"] == "second"


def test_apply_changes_merges_and_is_idempotent(spark):
    base = _df(spark, [(1, 1, "U", "a"), (2, 1, "U", "x")])
    changes = _df(spark, [(1, 2, "U", "a2"), (3, 1, "U", "new"),
                          (2, 2, "D", None)])
    merged = apply_changes(base, changes, ["k"], ["seq"],
                           delete_predicate=F.col("op") == "D")
    rows = {r["k"]: r["v"] for r in merged.collect()}
    assert rows == {1: "a2", 3: "new"}
    # replaying the same change batch changes nothing
    again = apply_changes(merged, changes, ["k"], ["seq"],
                          delete_predicate=F.col("op") == "D")
    assert {r["k"]: r["v"] for r in again.collect()} == rows


def test_scd2_intervals_are_contiguous_and_single_current(spark):
    log = _df(spark, [
        (1, 10, "U", "a"), (1, 20, "U", "b"), (1, 30, "U", "c"),
        (2, 5, "U", "x"),
    ])
    hist = scd2_history(log, ["k"], ["seq"]).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r["valid_from"])
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]  # no gaps, no overlaps


class TestTableDiff:
    """Snapshot diff: change classification + column-level blame."""

    def _diff(self, spark, old_rows, new_rows, **kw):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.cdc import table_diff
        old = _df(spark, old_rows)
        new = _df(spark, new_rows)
        out = table_diff(old, new, ["k"], ["op", "v"], **kw)
        return {r["k"]: (r["change_type"], r["changed_cols"]) for r in out.collect()}

    def test_insert_delete_update_classified(self, spark):
        d = self._diff(
            spark,
            [(1, 1, "U", "a"), (2, 1, "U", "x"), (3, 1, "U", "same")],
            [(1, 2, "U", "a2"), (3, 1, "U", "same"), (4, 1, "U", "new")],
        )
        assert d == {
            1: ("update", "v"),
            2: ("delete", ""),
            4: ("insert", ""),
        }  # key 3 unchanged -> dropped

    def test_null_transitions_count_as_changes(self, spark):
        d = self._diff(
            spark,
            [(1, 1, "U", None), (2, 1, "U", "x"), (3, 1, None, None)],
            [(1, 1, "U", "now"), (2, 1, "U", None), (3, 1, None, None)],
        )
        # NULL->value and value->NULL both blame the column; all-NULL
        # comparands on both sides are equal (key 3 unchanged).
        assert d == {1: ("update", "v"), 2: ("update", "v")}

    def test_multi_column_blame_is_comma_joined(self, spark):
        d = self._diff(
            spark,
            [(1, 1, "U", "a")],
            [(1, 1, "D", "b")],
        )
        assert d == {1: ("update", "op,v")}

    def test_include_unchanged_keeps_all_keys(self, spark):
        d = self._diff(
            spark,
            [(1, 1, "U", "a")],
            [(1, 1, "U", "a")],
            include_unchanged=True,
        )
        assert d == {1: ("unchanged", "")}

    def test_compare_cols_defaults_to_non_key_columns(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.cdc import table_diff
        old = _df(spark, [(1, 1, "U", "a")])
        new = _df(spark, [(1, 2, "U", "a")])  # seq changed -> update
        out = table_diff(old, new, ["k"]).collect()
        assert [(r["change_type"], r["changed_cols"]) for r in out] == [
            ("update", "seq")
        ]
