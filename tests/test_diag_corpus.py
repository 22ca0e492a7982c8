"""Tests for skew diagnostics and the JSONL corpus source."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import (
    key_histogram,
    mad_outliers,
    skew_report,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.sources.text_corpus import (
    read_jsonl_corpus,
    write_jsonl_corpus,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="corpus_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_skew_report_flags_hot_key(spark):
    # ~91% of rows land on key 0; the remainder spread over keys 10..90
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id") % 100).alias("k")
    )
    row = skew_report(df, ["k"]).collect()[0]
    assert row["n_rows"] == 10_000
    assert row["n_keys"] == 10
    assert row["max_count"] == 9_100
    assert row["skew_factor"] > 5  # hot key dominates the mean
    hist = key_histogram(df, ["k"], top_n=3).collect()
    assert hist[0]["k"] == 0 and hist[0]["row_share"] > 0.89


def test_skew_report_uniform_key_is_flat(spark):
    df = spark.range(10_000).select((F.col("id") % 100).alias("k"))
    row = skew_report(df, ["k"]).collect()[0]
    assert row["n_keys"] == 100
    assert row["skew_factor"] == 1.0
    assert row["p50_count"] == row["p99_count"] == 100.0


def test_mad_outliers_flags_spike_not_bulk(spark):
    rows = [("s", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 9, 10, 500]]
    rows += [("const", 5.0)] * 5 + [("const", 6.0)]  # MAD=0 series
    df = spark.createDataFrame(rows, "series string, value double")
    out = mad_outliers(df, ["series"], "value", k=3.5).collect()
    spikes = [r for r in out if r["series"] == "s" and r["is_outlier"]]
    assert [r["value"] for r in spikes] == [500.0]
    # constant series: ANY deviation is an outlier under the 0-MAD guard
    const_flags = {r["value"]: r["is_outlier"] for r in out if r["series"] == "const"}
    assert const_flags == {5.0: False, 6.0: True}


def test_jsonl_roundtrip_and_corrupt_routing(spark, sf_dir, tmpdir):
    from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = f"{tmpdir}/corpus"
    write_jsonl_corpus(docs, path)
    good, bad = read_jsonl_corpus(spark, path)
    assert bad.count() == 0
    assert good.count() == docs.count()
    assert sorted(good.columns) == sorted(docs.columns)
    assert (
        good.agg(F.sum(F.length("text"))).collect()[0][0]
        == docs.agg(F.sum(F.length("text"))).collect()[0][0]
    )


def test_jsonl_corrupt_and_textless_lines_route_out(spark, tmpdir):
    lines = [
        '{"doc_id": 1, "text": "good doc", "lang": "en", "source": "s", "n_chars": 8}',
        "this is not json at all {",
        '{"doc_id": 2, "lang": "en", "source": "s", "n_chars": 0}',  # no text key
        '{"doc_id": 3, "text": null, "lang": "en", "source": "s", "n_chars": 0}',
    ]
    path = f"{tmpdir}/mixed"
    spark.createDataFrame([(l,) for l in lines], "value string").coalesce(1) \
        .write.text(path)
    good, bad = read_jsonl_corpus(spark, path)
    assert [r["doc_id"] for r in good.collect()] == [1]
    assert bad.count() == 3


class TestSeasonalOutliers:
    """Slot-wise anomaly scoring: a quiet-hour spike flags while the same
    magnitude at rush hour does not — the case a global rule cannot get
    right."""

    def _df(self, spark):
        import datetime as dt
        rows = []
        t0 = dt.datetime(2024, 3, 1)
        for day in range(10):
            # hour 3 (quiet): baseline ~10; hour 12 (rush): baseline ~100
            rows.append(("m", t0 + dt.timedelta(days=day, hours=3), 10.0 + day % 3))
            rows.append(("m", t0 + dt.timedelta(days=day, hours=12), 100.0 + day % 5))
        # the anomaly: a rush-hour-sized value in the quiet hour...
        rows.append(("m", t0 + dt.timedelta(days=10, hours=3), 100.0))
        # ...and a perfectly normal rush-hour value of the SAME magnitude
        rows.append(("m", t0 + dt.timedelta(days=10, hours=12), 100.0))
        return spark.createDataFrame(rows, "k string, ts timestamp, v double")

    def test_quiet_hour_spike_flags_rush_hour_twin_does_not(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import seasonal_outliers
        out = seasonal_outliers(self._df(spark), ["k"], "ts", "v", k=3.0)
        flags = {(r["season_slot"], r["v"]): r["is_outlier"] for r in out.collect()}
        assert flags[(3, 100.0)] is True
        assert flags[(12, 100.0)] is False

    def test_single_extreme_flags_when_slot_large_enough(self, spark):
        # a lone outlier's z is bounded by sqrt(n-1) (it inflates the
        # stddev it is scored against), so the slot needs n >= 11 for a
        # z > 3 flag: 15 baseline points + one 10x spike -> z = sqrt(15).
        import datetime as dt
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import seasonal_outliers
        t0 = dt.datetime(2024, 3, 1, 5)
        df = spark.createDataFrame(
            [("k", t0 + dt.timedelta(days=i), 7.0) for i in range(15)]
            + [("k", t0 + dt.timedelta(days=20), 70.0)],
            "k string, ts timestamp, v double",
        )
        out = {r["v"]: r["is_outlier"]
               for r in seasonal_outliers(df, ["k"], "ts", "v").collect()}
        assert out[70.0] is True and out[7.0] is False

    def test_unknown_season_raises(self, spark):
        import pytest as _pytest
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import seasonal_outliers
        with _pytest.raises(ValueError):
            seasonal_outliers(self._df(spark), ["k"], "ts", "v", season="lunar")


class TestCusumChangepoints:
    """CUSUM drift detection: a sustained small shift trips the detector
    while a 3-sigma point rule stays silent; the closed-form equals the
    textbook recursion."""

    def _series(self):
        # 40 baseline points oscillating ±1 around 10, then 40 at 12±1:
        # each post-shift point is well inside any 3σ point rule, but the
        # drift accumulates.
        pre = [10.0 + (1 if i % 2 else -1) for i in range(40)]
        post = [12.0 + (1 if i % 2 else -1) for i in range(40)]
        return pre + post

    def _df(self, spark, vals):
        import datetime as dt
        t0 = dt.datetime(2024, 3, 1)
        return spark.createDataFrame(
            [("s", t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)],
            "k string, ts timestamp, v double",
        )

    def test_sustained_shift_detected_and_localized_after_shift(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import (
            cusum_changepoints, mad_outliers,
        )
        vals = self._series()
        df = self._df(spark, vals)
        out = cusum_changepoints(df, ["k"], "ts", "v", threshold_k=5.0)
        rows = sorted(out.collect(), key=lambda r: r["ts"])
        # the baseline is the WHOLE series (documented caveat), so the
        # pre-shift half drifts LOW of the global mean and the post-shift
        # half HIGH — each side's statistic must cross only in its half
        hi = [r["cusum_hi"] for r in rows]
        lo = [r["cusum_lo"] for r in rows]
        assert max(hi[:40]) < 5.0 and max(hi[40:]) > 5.0
        assert max(lo[40:]) < max(lo[:40])  # low-side drift belongs to half 1
        assert any(r["is_changepoint"] for r in rows)
        # the point rule misses every post-shift value (each is ~1σ high)
        pt = mad_outliers(df, ["k"], "v", k=3.5)
        assert pt.filter("is_outlier").count() == 0

    def test_closed_form_equals_recursion(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import cusum_changepoints
        import statistics
        vals = self._series()
        out = sorted(
            cusum_changepoints(self._df(spark, vals), ["k"], "ts", "v").collect(),
            key=lambda r: r["ts"],
        )
        # reference recursion in the same integer units
        xi = [round(v * 1024) for v in vals]
        n, s = len(xi), sum(xi)
        sd = statistics.pstdev(xi)
        slack = round(0.5 * sd * n * 1024)
        s_hi = 0
        for i, x in enumerate(xi):
            d = (x * n - s) * 1024 - slack
            s_hi = max(0, s_hi + d)
            got = out[i]["cusum_hi"]
            assert abs(got - s_hi / (sd * n * 1024)) < 1e-6, i

    def test_constant_series_never_flags(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import cusum_changepoints
        out = cusum_changepoints(
            self._df(spark, [5.0] * 30), ["k"], "ts", "v"
        )
        assert out.filter("is_changepoint").count() == 0


class TestChiSquare:
    """Chi-square independence: ~0 for independent columns, large for a
    perfectly dependent pair; reference-value equality on a known table."""

    def test_dependent_vs_independent(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import chi_square_independence
        rows_dep = [(i, f"a{i % 3}", f"b{i % 3}") for i in range(300)]   # b == a
        rows_ind = [(i, f"a{i % 3}", f"b{(i // 3) % 4}") for i in range(300)]
        dep = chi_square_independence(
            spark.createDataFrame(rows_dep, "id long, x string, y string"), "x", "y"
        ).collect()[0]
        ind = chi_square_independence(
            spark.createDataFrame(rows_ind, "id long, x string, y string"), "x", "y"
        ).collect()[0]
        assert dep["chi2"] > 100 * (ind["chi2"] + 1e-9)
        assert dep["dof"] == 4 and ind["dof"] == 6
        assert abs(ind["chi2"]) < 1e-6  # balanced grid: exactly independent

    def test_reference_value_2x2(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import chi_square_independence
        # classic 2x2 with cells [[10, 20], [20, 10]]: chi2 = 60*(100-400)^2/(30*30*30*30)... 
        # computed by the textbook formula: N(ad-bc)^2 / (r1 r2 c1 c2)
        rows = (
            [(0, "x", "p")] * 10 + [(0, "x", "q")] * 20
            + [(0, "y", "p")] * 20 + [(0, "y", "q")] * 10
        )
        df = spark.createDataFrame(
            [(i, a, b) for i, (_, a, b) in enumerate(rows)],
            "id long, x string, y string",
        )
        got = chi_square_independence(df, "x", "y").collect()[0]
        n, a, b, c, d = 60, 10, 20, 20, 10
        expect = n * (a * d - b * c) ** 2 / (30 * 30 * 30 * 30)
        assert abs(got["chi2"] - expect) < 1e-6
        assert got["dof"] == 1 and got["n_rows"] == 60

    def test_nulls_excluded(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import chi_square_independence
        df = spark.createDataFrame(
            [(1, "a", "p"), (2, None, "q"), (3, "b", None), (4, "b", "q")],
            "id long, x string, y string",
        )
        got = chi_square_independence(df, "x", "y").collect()[0]
        assert got["n_rows"] == 2


class TestCorrelationMatrix:
    def test_perfect_inverse_and_independent(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import correlation_matrix
        rows = [(float(i), float(-2 * i + 7), float((i * 37) % 11))
                for i in range(200)]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        out = {(r["col_x"], r["col_y"]): r["r"]
               for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
        assert abs(out[("a", "b")] + 1.0) < 1e-6    # perfect inverse
        assert abs(out[("a", "c")]) < 0.2           # scrambled residue

    def test_constant_column_yields_null(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import correlation_matrix
        df = spark.createDataFrame(
            [(float(i), 5.0) for i in range(50)], "a double, b double"
        )
        r = correlation_matrix(df, ["a", "b"]).collect()[0]["r"]
        assert r is None

    def test_listwise_null_deletion(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import correlation_matrix
        df = spark.createDataFrame(
            [(1.0, 2.0), (None, 3.0), (2.0, None), (3.0, 6.0)],
            "a double, b double",
        )
        r = correlation_matrix(df, ["a", "b"]).collect()[0]
        assert r["n"] == 2

    def test_needs_two_columns(self, spark):
        import pytest as _pytest
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.diagnostics import correlation_matrix
        df = spark.createDataFrame([(1.0,)], "a double")
        with _pytest.raises(ValueError):
            correlation_matrix(df, ["a"])
