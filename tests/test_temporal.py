"""As-of and range/bucket join semantics + physical-plan checks."""

from datetime import datetime

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.temporal import (
    as_of_join,
    range_bucket_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_inclusive_and_ordering(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts("2026-01-01T10:00:00")),  # exact tie with right → inclusive
            (2, 7, _ts("2026-01-01T11:00:00")),  # after both rights → latest wins
            (3, 7, _ts("2026-01-01T08:00:00")),  # before any right → NULL
            (4, 9, _ts("2026-01-01T12:00:00")),  # key with no rights → NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2026-01-01T09:00:00"), 1.0),
            (7, _ts("2026-01-01T10:00:00"), 2.0),
        ],
        "user_id long, ts timestamp, v double",
    )
    out = {r["event_id"]: r for r in as_of_join(left, right, on="user_id").collect()}
    assert out[1]["v_asof"] == 2.0 and out[1]["asof_ts"] == _ts("2026-01-01T10:00:00")
    assert out[2]["v_asof"] == 2.0
    assert out[3]["v_asof"] is None and out[3]["asof_ts"] is None
    assert out[4]["v_asof"] is None
    assert len(out) == 4  # left rows preserved exactly


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2026-01-01T10:00:00")), (2, 7, _ts("2026-01-01T10:59:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _ts("2026-01-01T09:59:00"), 5.0)], "user_id long, ts timestamp, v double"
    )
    out = {
        r["event_id"]: r
        for r in as_of_join(
            left, right, on="user_id", tolerance_seconds=600
        ).collect()
    }
    assert out[1]["v_asof"] == 5.0          # 1 min old — within tolerance
    assert out[2]["v_asof"] is None         # 60 min old — stale, nulled
    assert out[2]["asof_ts"] is None


def test_range_bucket_join_plan_and_semantics(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 149.9), (4, -1.0)], "id long, value double"
    )
    buckets = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0)], "bucket string, lo double, hi double"
    )
    out = range_bucket_join(df, buckets, value_col="value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    got = {r["id"]: r["bucket"] for r in out.collect()}
    assert got == {1: "low", 2: "mid", 3: "mid", 4: None}  # lo inclusive, hi exclusive


# ------------------------- property tests (oracles) -------------------------

import pandas as pd
from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50), st.integers(0, 100)),
        min_size=1, max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50)),
        min_size=1, max_size=25, unique=True,
    ),
)
def test_asof_matches_pandas_merge_asof(spark, right_rows, left_rows):
    base = 1_700_000_000
    # unique (key, ts) on the right per the determinism contract
    rdict = {}
    for key, toff, val in right_rows:
        rdict[(key, toff)] = val
    right_pd = pd.DataFrame(
        [
            {"k": k, "ts": pd.Timestamp(base + toff, unit="s", tz="UTC"), "v": float(val)}
            for (k, toff), val in rdict.items()
        ]
    )
    left_pd = pd.DataFrame(
        [
            {"lid": i, "k": k, "ts": pd.Timestamp(base + toff, unit="s", tz="UTC")}
            for i, (k, toff) in enumerate(left_rows)
        ]
    )
    expected = pd.merge_asof(
        left_pd.sort_values(["ts", "lid"]),
        right_pd.sort_values("ts"),
        on="ts", by="k", direction="backward", allow_exact_matches=True,
    ).set_index("lid")["v"]

    left = spark.createDataFrame(left_pd, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(right_pd, "k long, ts timestamp, v double")
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.temporal import as_of_join

    got = {
        r["lid"]: r["v_asof"]
        for r in as_of_join(left, right, on="k").collect()
    }
    for lid, exp in expected.items():
        g = got[lid]
        assert (pd.isna(exp) and g is None) or (g is not None and g == exp)


def test_salted_join_matches_plain_join(spark):
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.temporal import salted_join

    # one pathologically hot key (90% of rows) + a long tail
    big = spark.createDataFrame(
        [(i, 1 if i % 10 else 2, f"p{i}") for i in range(1000)],
        "row_id long, k long, payload string",
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unmatched")], "k long, label string")

    plain = {(r["row_id"], r["label"]) for r in big.join(small, "k").collect()}
    salted = {
        (r["row_id"], r["label"])
        for r in salted_join(big, small, "k", salt_source="row_id", n_salts=8).collect()
    }
    assert salted == plain and len(plain) == 1000

    # left join keeps unmatched big rows exactly once
    lp = big.join(small, "k", "left").count()
    ls = salted_join(big, small, "k", salt_source="row_id", how="left").count()
    assert lp == ls == 1000

    # outer join types would duplicate unmatched small-side rows n_salts
    # times — refused loudly instead of silently wrong
    import pytest

    for bad in ("right", "full", "outer", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", salt_source="row_id", how=bad)


def test_interval_overlap_join_matches_naive_and_avoids_cross_product(spark):
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.temporal import interval_overlap_join

    left = spark.createDataFrame(
        [(1, "u", 0, 100), (2, "u", 90, 200), (3, "u", 500, 600),
         (4, "v", 0, 100), (5, "u", 600, 600)],   # empty interval dropped
        "iid long, k string, s long, e long",
    )
    right = spark.createDataFrame(
        [(10, "u", 95, 105), (11, "u", 199, 510), (12, "v", 100, 110),
         (13, "w", 0, 1000)],
        "iid long, k string, s long, e long",
    )
    out = interval_overlap_join(
        left, right, l_id="iid", l_start="s", l_end="e",
        r_id="iid", r_start="s", r_end="e", bucket_width=64, by=["k"],
    )
    got = sorted((r["iid_l"], r["iid_r"]) for r in out.collect())
    # naive reference: same-key overlap with half-open semantics
    naive = sorted(
        (l[0], r[0])
        for l in left.collect() for r in right.collect()
        if l[1] == r[1] and l[2] < r[3] and r[2] < l[3] and l[2] < l[3] and r[2] < r[3]
    )
    assert got == naive == [(1, 10), (2, 10), (2, 11), (3, 11)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_wide_intervals_span_many_cells(spark):
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.temporal import interval_overlap_join

    left = spark.createDataFrame([(1, 0, 10_000)], "iid long, s long, e long")
    right = spark.createDataFrame([(2, 9_990, 9_995)], "iid long, s long, e long")
    out = interval_overlap_join(
        left, right, l_id="iid", l_start="s", l_end="e",
        r_id="iid", r_start="s", r_end="e", bucket_width=16,
    ).collect()
    assert [(r["iid_l"], r["iid_r"]) for r in out] == [(1, 2)]  # deduped to one row


class TestResampleFfill:
    def _run(self, spark, rows):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.temporal import resample_ffill
        df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
        out = resample_ffill(df, "k", "ts", "v", step="1 hour")
        return sorted((r["k"], str(r["ts"]), r["v"]) for r in out.collect())

    def test_carry_forward_and_leading_null(self, spark):
        import datetime as dt
        t = lambda h, m=0: dt.datetime(2026, 1, 1, h, m)  # noqa: E731
        rows = [(1, t(10, 30), 5.0), (1, t(12, 15), 7.0)]
        got = self._run(spark, rows)
        # grid: 10:00 (before first obs -> NULL), 11:00 (carries 5), 12:00
        # (still 5 - obs at 12:15 is later)
        assert got == [
            (1, "2026-01-01 10:00:00", None),
            (1, "2026-01-01 11:00:00", 5.0),
            (1, "2026-01-01 12:00:00", 5.0),
        ]

    def test_tick_on_observation_takes_it(self, spark):
        import datetime as dt
        rows = [(1, dt.datetime(2026, 1, 1, 10, 0), 3.0)]
        assert self._run(spark, rows) == [(1, "2026-01-01 10:00:00", 3.0)]

    def test_series_isolation(self, spark):
        import datetime as dt
        t = lambda h: dt.datetime(2026, 1, 1, h)  # noqa: E731
        rows = [(1, t(10), 1.0), (2, t(10), 9.0), (1, t(11), 2.0)]
        got = {x[:2]: x[2] for x in self._run(spark, rows)}
        assert got[(1, "2026-01-01 11:00:00")] == 2.0
        assert got[(2, "2026-01-01 10:00:00")] == 9.0
        assert (2, "2026-01-01 11:00:00") not in got
