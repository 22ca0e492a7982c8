"""Incremental rollup maintenance: merged partial states must equal a
one-shot recompute for ANY batching of the input — the algebraic property
that makes O(increment) refresh exact."""

import datetime as dt

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.rollup import (
    finalize_rollup,
    merge_rollup,
    rollup_partials,
)

SCHEMA = "k string, ts timestamp, v double"


def _rows():
    t0 = dt.datetime(2024, 3, 1)
    out = []
    for i in range(60):
        out.append(
            (f"g{i % 3}", t0 + dt.timedelta(hours=i * 7), float((i * 37) % 100) / 4)
        )
    out.append(("g0", t0, None))  # NULL value: counts nowhere
    return out


def _final(df):
    return sorted(tuple(r) for r in finalize_rollup(df).collect())


def test_any_batching_equals_one_shot(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    one_shot = _final(rollup_partials(df, ["k"], "ts", "v"))

    for cut in (1, 17, 30, 60):
        a = spark.createDataFrame(rows[:cut], SCHEMA)
        b = spark.createDataFrame(rows[cut:], SCHEMA)
        merged = merge_rollup(
            rollup_partials(a, ["k"], "ts", "v"),
            rollup_partials(b, ["k"], "ts", "v"),
        )
        assert _final(merged) == one_shot, f"cut={cut}"


def test_merge_is_commutative_and_nary(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    one_shot = _final(rollup_partials(df, ["k"], "ts", "v"))
    parts = [
        rollup_partials(spark.createDataFrame(rows[i::3], SCHEMA), ["k"], "ts", "v")
        for i in range(3)
    ]
    assert _final(merge_rollup(parts[2], parts[0], parts[1])) == one_shot


def test_empty_increment_is_identity(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    state = rollup_partials(df, ["k"], "ts", "v")
    empty = rollup_partials(df.filter(F.lit(False)), ["k"], "ts", "v")
    assert _final(merge_rollup(state, empty)) == _final(state)


def test_null_values_contribute_no_state(spark):
    df = spark.createDataFrame(
        [("g", dt.datetime(2024, 3, 1, 5), None)], SCHEMA
    )
    rows = rollup_partials(df, ["k"], "ts", "v").collect()
    assert len(rows) == 1 and rows[0]["cnt"] == 0 and rows[0]["vsum"] is None


def test_hourly_granularity(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    day = rollup_partials(df, ["k"], "ts", "v", granularity="day")
    hour = rollup_partials(df, ["k"], "ts", "v", granularity="hour")
    # hour states roll up into the day states (re-truncate + merge)
    rehoused = merge_rollup(
        hour.withColumn("window_start", F.date_trunc("day", "window_start"))
    )
    assert _final(rehoused) == _final(day)


class TestHistogramState:
    """Mergeable fixed-bin histograms: merge == full build, percentile
    within one bin width of exact, boundary clamps."""

    def _vals(self):
        return [float((i * 37) % 200) / 2 for i in range(400)]  # 0..99.5

    def _df(self, spark, vals):
        import datetime as dt
        t0 = dt.datetime(2024, 3, 1)
        return spark.createDataFrame(
            [("g", t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)],
            SCHEMA,
        )

    def test_merge_equals_full_build(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.rollup import (
            histogram_state, merge_histograms,
        )
        vals = self._vals()
        full = histogram_state(
            self._df(spark, vals), ["k"], "ts", "v", lo=0.0, hi=100.0, bins=20
        ).collect()
        a = histogram_state(
            self._df(spark, vals[:150]), ["k"], "ts", "v", lo=0.0, hi=100.0, bins=20
        )
        b = histogram_state(
            self._df(spark, vals[150:]), ["k"], "ts", "v", lo=0.0, hi=100.0, bins=20
        )
        # same window (all values on 2024-03-01): shift minute offsets keep day
        merged = merge_histograms(a, b).collect()
        assert sorted(map(tuple, merged)) == sorted(map(tuple, full))
        assert sum(full[0]["hist"]) == 400

    def test_percentile_within_bin_width(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.rollup import (
            histogram_state, percentile_from_histogram,
        )
        import statistics
        vals = self._vals()
        state = histogram_state(
            self._df(spark, vals), ["k"], "ts", "v", lo=0.0, hi=100.0, bins=50
        )
        for p in (50, 95):
            est = percentile_from_histogram(state, p, lo=0.0, hi=100.0).collect()[0][f"p{p}"]
            exact = statistics.quantiles(vals, n=100)[p - 1]
            assert abs(est - exact) <= 2.0 + 1e-9, (p, est, exact)  # bin width 2

    def test_out_of_range_values_clamp(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.rollup import (
            histogram_state, percentile_from_histogram,
        )
        df = self._df(spark, [-5.0, -4.0, 500.0, 600.0])
        state = histogram_state(df, ["k"], "ts", "v", lo=0.0, hi=10.0, bins=5)
        h = state.collect()[0]["hist"]
        assert h[0] == 2 and h[-1] == 2 and sum(h) == 4
        p25 = percentile_from_histogram(state, 25, lo=0.0, hi=10.0).collect()[0]["p25"]
        p99 = percentile_from_histogram(state, 99, lo=0.0, hi=10.0).collect()[0]["p99"]
        assert p25 == 0.0 and p99 == 10.0  # under/overflow clamp to the grid

    def test_grid_validation(self, spark):
        import pytest as _pytest
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.rollup import (
            histogram_state, percentile_from_histogram,
        )
        df = self._df(spark, [1.0])
        with _pytest.raises(ValueError):
            histogram_state(df, ["k"], "ts", "v", lo=5.0, hi=5.0)
        state = histogram_state(df, ["k"], "ts", "v", lo=0.0, hi=10.0)
        with _pytest.raises(ValueError):
            percentile_from_histogram(state, 0, lo=0.0, hi=10.0)


class TestDistinctState:
    """KMV distinct-count state: merge == one-shot, exact below k,
    bounded error above."""

    def _df(self, spark, pairs):
        import datetime as dt
        t0 = dt.datetime(2024, 3, 1)
        return spark.createDataFrame(
            [("g", t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(pairs)],
            "k string, ts timestamp, v long",
        )

    def test_merge_equals_one_shot(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.rollup import (
            distinct_state, merge_distinct_state,
        )
        vals = [i % 500 for i in range(900)]
        full = distinct_state(self._df(spark, vals), ["k"], "ts", "v", k=64).collect()
        merged = merge_distinct_state(
            distinct_state(self._df(spark, vals[:400]), ["k"], "ts", "v", k=64),
            distinct_state(self._df(spark, vals[400:]), ["k"], "ts", "v", k=64),
            k=64,
        ).collect()
        assert sorted(map(tuple, merged)) == sorted(map(tuple, full))

    def test_exact_below_k_and_bounded_above(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.rollup import (
            distinct_state, finalize_distinct,
        )
        small = finalize_distinct(
            distinct_state(self._df(spark, [1, 2, 3, 2, 1]), ["k"], "ts", "v", k=64),
            k=64,
        ).collect()[0]
        assert small["n_sketch"] == 3 and small["est_distinct"] == 3.0
        big = finalize_distinct(
            distinct_state(self._df(spark, list(range(2000)) * 2),
                           ["k"], "ts", "v", k=64),
            k=64,
        ).collect()[0]
        # KMV standard error ~1/sqrt(k-1) ≈ 12.6%; allow 4 sigma
        assert abs(big["est_distinct"] - 2000) / 2000 < 0.5
