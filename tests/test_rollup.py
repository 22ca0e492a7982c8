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
