"""Scheduling surface (ref EventBridge/Glue cron consumption) + S4 seam."""

import datetime as dt

import pytest

from aws_dataset_ingestion_metrics_collection_framework_spark.scheduling import (
    FREQUENCY_CRONS,
    cron_matches,
    due_work,
    next_fire,
)


def test_reference_frequency_crons():
    midnight = dt.datetime(2026, 1, 1, 0, 0)
    noon_sharp = dt.datetime(2026, 1, 1, 12, 0)
    odd_minute = dt.datetime(2026, 1, 1, 12, 37)
    # daily rule fires only at 00:00
    assert cron_matches(FREQUENCY_CRONS["day"], midnight)
    assert not cron_matches(FREQUENCY_CRONS["day"], noon_sharp)
    # hourly rule fires at minute 0 of every hour
    assert cron_matches(FREQUENCY_CRONS["hour"], noon_sharp)
    assert not cron_matches(FREQUENCY_CRONS["hour"], odd_minute)
    # minutely rule fires always (0/1 step)
    assert cron_matches(FREQUENCY_CRONS["minute"], odd_minute)


def test_cron_fields():
    assert cron_matches("30 14 * * *", dt.datetime(2026, 3, 2, 14, 30))
    assert not cron_matches("30 14 * * *", dt.datetime(2026, 3, 2, 14, 31))
    # list + range
    assert cron_matches("0 9-17 * * *", dt.datetime(2026, 3, 2, 11, 0))
    assert cron_matches("0,30 * * * *", dt.datetime(2026, 3, 2, 11, 30))
    # AWS day-of-week: 1=Sunday ... 2026-01-04 is a Sunday
    assert cron_matches("cron(0 0 ? * 1 *)", dt.datetime(2026, 1, 4, 0, 0))
    assert not cron_matches("cron(0 0 ? * 1 *)", dt.datetime(2026, 1, 5, 0, 0))
    # classic day-of-week: 0=Sunday
    assert cron_matches("0 0 * * 0", dt.datetime(2026, 1, 4, 0, 0))
    with pytest.raises(ValueError):
        cron_matches("cron(0 0 * *)", dt.datetime(2026, 1, 1))
    # range-with-step: '1-5/2' matches 1,3,5 and NOTHING past the range end
    for minute, ok in [(1, True), (3, True), (5, True), (2, False), (7, False), (9, False)]:
        assert cron_matches("1-5/2 * * * *", dt.datetime(2026, 3, 2, 11, minute)) is ok
    # plain start/step still open-ended ('30/15' → 30, 45)
    assert cron_matches("30/15 * * * *", dt.datetime(2026, 3, 2, 11, 45))
    assert not cron_matches("30/15 * * * *", dt.datetime(2026, 3, 2, 11, 40))


def test_next_fire():
    got = next_fire("cron(0 0 * * ? *)", dt.datetime(2026, 1, 1, 5, 30))
    assert got == dt.datetime(2026, 1, 2, 0, 0)
    assert next_fire("0 * * * *", dt.datetime(2026, 1, 1, 5, 0)) == dt.datetime(2026, 1, 1, 6, 0)


def test_due_work():
    class _Set:
        def __init__(self, name, schedule):
            self.name, self.schedule, self.metrics = name, schedule, []

    class _Def:
        def __init__(self, sets):
            self.metric_sets = sets

    class _DS:
        def __init__(self, defs):
            self.definitions = defs

    ds = _DS([_Def([_Set("daily_rollups", "cron(0 0 * * ? *)"),
                    _Set("hourly_checks", "cron(0 * * * ? *)"),
                    _Set("unscheduled", None)])])
    at_midnight = due_work(ds, dt.datetime(2026, 1, 1, 0, 0))
    assert at_midnight["business_sets"] == ["daily_rollups", "hourly_checks"]
    assert at_midnight["scrape_frequencies"] == ["day", "hour", "minute"]
    at_noon = due_work(ds, dt.datetime(2026, 1, 1, 12, 0))
    assert at_noon["business_sets"] == ["hourly_checks"]
    assert at_noon["scrape_frequencies"] == ["hour", "minute"]
    assert at_noon["deferred_sets"] == []

    # concurrency guard (reference parity: max_concurrent_runs=1 per
    # business-metric job): a due set still running from an earlier tick
    # defers instead of double-launching; others are unaffected
    guarded = due_work(
        ds, dt.datetime(2026, 1, 1, 0, 0), running=["daily_rollups"]
    )
    assert guarded["business_sets"] == ["hourly_checks"]
    assert guarded["deferred_sets"] == ["daily_rollups"]
    # a raised cap re-admits it; two overlapping runs defer again
    assert due_work(
        ds, dt.datetime(2026, 1, 1, 0, 0),
        running=["daily_rollups"], max_concurrent=2,
    )["business_sets"] == ["daily_rollups", "hourly_checks"]
    assert due_work(
        ds, dt.datetime(2026, 1, 1, 0, 0),
        running=["daily_rollups", "daily_rollups"], max_concurrent=2,
    )["deferred_sets"] == ["daily_rollups"]


def test_stream_channel_adapters(spark):
    from aws_dataset_ingestion_metrics_collection_framework_spark.streaming import open_stream_channel

    # socket adapter constructs lazily (connection happens at query start)
    df = open_stream_channel(spark, "socket", host="localhost", port=19999)
    assert df.isStreaming and [f.name for f in df.schema.fields] == ["value"]
    with pytest.raises(ValueError):
        open_stream_channel(spark, "kinesis-direct")
