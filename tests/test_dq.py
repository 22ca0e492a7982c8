"""Data-quality operator tests (operators/dq.py)."""

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import (
    check_constraints,
    check_referential,
    check_unique,
    profile_table,
)


def _df(spark):
    rows = [
        (1, "a", 10.0), (2, "b", None), (3, None, 30.0), (4, "a", 40.0),
        (None, "c", 50.0),
    ]
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_profile_counts_nulls_and_distincts(spark):
    p = {r["column"]: r for r in profile_table(_df(spark)).collect()}
    assert p["id"]["n_rows"] == 5
    assert p["id"]["n_nulls"] == 1 and p["id"]["n_distinct"] == 4
    assert p["cat"]["n_nulls"] == 1 and p["cat"]["n_distinct"] == 3
    assert p["v"]["null_ratio"] == 0.2


def test_profile_approx_mode_close_to_exact(spark):
    df = spark.range(10_000).select((F.col("id") % 1000).alias("k"))
    approx = {r["column"]: r["n_distinct"]
              for r in profile_table(df, exact=False).collect()}
    assert abs(approx["k"] - 1000) / 1000 < 0.05


def test_constraints_null_predicate_is_violation(spark):
    out = {r["check"]: r for r in check_constraints(_df(spark), {
        "v_positive": F.col("v") > 0,          # null v row must violate
        "id_not_null": F.col("id").isNotNull(),
    }).collect()}
    assert out["v_positive"]["n_violations"] == 1 and not out["v_positive"]["passed"]
    assert out["id_not_null"]["n_violations"] == 1


def test_unique_and_referential(spark):
    df = _df(spark)
    u = check_unique(df, ["cat"]).collect()[0]
    assert u["n_violations"] == 1 and not u["passed"]  # 'a' appears twice
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pid long")
    r = check_referential(df, parent, [("id", "pid")]).collect()[0]
    # id=4 orphan + null id orphan
    assert r["n_violations"] == 2 and not r["passed"]
    ok = check_referential(df.filter(F.col("id") <= 3), parent,
                           [("id", "pid")]).collect()[0]
    assert ok["passed"]


class TestNumericHistogram:
    def test_bins_and_bounds(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import numeric_histogram
        df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
        rows = {r["bin"]: r for r in numeric_histogram(df, "v", bins=10).collect()}
        assert len(rows) == 10
        assert sum(r["n"] for r in rows.values()) == 100
        assert rows[0]["lo"] == 0.0 and rows[9]["hi"] == 99.0
        assert rows[9]["n"] == 10  # max value closes into the last bin

    def test_constant_column_single_bin(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import numeric_histogram
        df = spark.createDataFrame([(4.2,)] * 7, "v double")
        rows = numeric_histogram(df, "v", bins=5).collect()
        assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 7

    def test_nulls_excluded_and_fixed_bounds(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import numeric_histogram
        df = spark.createDataFrame([(1.0,), (None,), (9.0,)], "v double")
        rows = numeric_histogram(df, "v", bins=2, min_val=0.0, max_val=10.0).collect()
        assert sum(r["n"] for r in rows) == 2
        assert {r["bin"] for r in rows} == {0, 1}


class TestWriteWithExpectations:
    """Write-audit-publish: bad batches never land; quarantine captures
    the violating rows with check blame."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, v double")

    def test_passing_batch_lands(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import write_with_expectations
        p = str(tmp_path / "out")
        rep = write_with_expectations(
            self._df(spark, [(1, 0.5), (2, 0.9)]), p,
            {"v_in_range": (F.col("v") >= 0) & (F.col("v") <= 1),
             "id_not_null": F.col("id").isNotNull()},
        )
        assert spark.read.parquet(p).count() == 2
        assert all(r["passed"] for r in rep.collect())

    def test_failing_batch_never_lands_and_quarantines(self, spark, tmp_path):
        import pytest as _pytest
        from pyspark.sql import functions as F
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import (
            ExpectationError, write_with_expectations,
        )
        p = str(tmp_path / "out")
        q = str(tmp_path / "quarantine")
        with _pytest.raises(ExpectationError) as ei:
            write_with_expectations(
                self._df(spark, [(1, 0.5), (2, 7.0), (None, 0.1)]), p,
                {"v_in_range": (F.col("v") >= 0) & (F.col("v") <= 1),
                 "id_not_null": F.col("id").isNotNull()},
                quarantine_path=q,
            )
        assert {f["check"] for f in ei.value.failures} == {"v_in_range", "id_not_null"}
        import os
        assert not os.path.exists(p)  # nothing published
        bad = {r["failed_checks"] for r in spark.read.parquet(q).collect()}
        assert bad == {"v_in_range", "id_not_null"}

    def test_null_predicate_counts_as_violation(self, spark, tmp_path):
        import pytest as _pytest
        from pyspark.sql import functions as F
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import (
            ExpectationError, write_with_expectations,
        )
        with _pytest.raises(ExpectationError):
            write_with_expectations(
                self._df(spark, [(1, None)]), str(tmp_path / "o"),
                {"v_positive": F.col("v") > 0},
            )


class TestPsiDrift:
    """PSI: zero for identical distributions, large for a shifted one,
    per-bin blame localizes the movement."""

    def _df(self, spark, vals):
        return spark.createDataFrame([(float(v),) for v in vals], "value double")

    def test_identical_distributions_score_zero(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import psi_drift
        vals = [i % 10 for i in range(500)]
        out = psi_drift(self._df(spark, vals), self._df(spark, vals),
                        "value", lo=0.0, hi=10.0, bins=10)
        total = out.filter("slot = -1").collect()[0]
        assert total["psi_term"] == 0.0

    def test_shift_detected_and_localized(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import psi_drift
        base = [i % 10 for i in range(500)]              # uniform 0..9
        cur = [(i % 5) + 5 for i in range(500)]          # mass moved to 5..9
        out = {r["slot"]: r for r in psi_drift(
            self._df(spark, base), self._df(spark, cur),
            "value", lo=0.0, hi=10.0, bins=10,
        ).collect()}
        assert out[-1]["psi_term"] > 0.25                # actionable drift
        # the emptied low bins carry large positive terms (p >> q)
        assert out[1]["psi_term"] > 0.1
        assert out[1]["cur_n"] == 0 and out[1]["base_n"] == 50

    def test_out_of_grid_values_counted_in_edge_slots(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import psi_drift
        out = {r["slot"]: r for r in psi_drift(
            self._df(spark, [-5, -5, 2, 2]), self._df(spark, [2, 2, 99, 99]),
            "value", lo=0.0, hi=10.0, bins=10,
        ).collect()}
        assert out[0]["base_n"] == 2 and out[0]["cur_n"] == 0
        assert out[11]["base_n"] == 0 and out[11]["cur_n"] == 2

    def test_grid_validation(self, spark):
        import pytest as _pytest
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import psi_drift
        df = self._df(spark, [1])
        with _pytest.raises(ValueError):
            psi_drift(df, df, "value", lo=1.0, hi=1.0)

    def test_empty_side_yields_null_not_fabricated_psi(self, spark):
        """ADVICE fix: an empty base or current side has no distribution
        to compare — x/0 is NULL under non-ANSI Spark and the old
        greatest(NULL, eps) floor fabricated a finite PSI. Every
        psi_term (and the slot=-1 total) must be NULL; the exact counts
        still report."""
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dq import psi_drift
        full = self._df(spark, [1, 2, 3, 4])
        empty = self._df(spark, []).filter("value is not null")
        for b, c in ((empty, full), (full, empty)):
            rows = psi_drift(b, c, "value", lo=0.0, hi=10.0, bins=10).collect()
            assert all(r["psi_term"] is None for r in rows)
            total = [r for r in rows if r["slot"] == -1][0]
            assert total["base_n"] + total["cur_n"] == 4
