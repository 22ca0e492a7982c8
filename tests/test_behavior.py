"""Funnel and cohort-retention operator tests (synthetic event goldens)."""

from datetime import datetime

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.behavior import (
    cohort_retention,
    funnel,
    funnel_summary,
)

SCHEMA = "user_id long, ts timestamp, event_type string"


def _t(day, hour=0):
    return datetime(2024, 1, day, hour)


def _events(spark):
    rows = [
        # user 1 completes the funnel in order
        (1, _t(1), "signup"), (1, _t(2), "click"), (1, _t(3), "purchase"),
        # user 2: purchase BEFORE click — step 3 must not count
        (2, _t(1), "signup"), (2, _t(3), "click"), (2, _t(2), "purchase"),
        # user 3: signup only
        (3, _t(5), "signup"),
        # user 4: never signed up — excluded entirely
        (4, _t(1), "click"), (4, _t(2), "purchase"),
        # user 5: multiple signups/clicks — earliest chain wins
        (5, _t(2), "signup"), (5, _t(1), "click"), (5, _t(4), "click"),
        (5, _t(6), "purchase"), (5, _t(3), "signup"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_funnel_ordering_and_partial_completion(spark):
    out = {r["user_id"]: r for r in
           funnel(_events(spark), "user_id", "ts", "event_type",
                  ["signup", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3, 5}          # user 4 never entered
    assert out[1]["completed_steps"] == 3
    assert out[2]["completed_steps"] == 2     # purchase precedes click → broken
    assert out[3]["completed_steps"] == 1
    # user 5: t1 = first signup (day 2), click must be AFTER it → day 4
    assert out[5]["t1"] == _t(2) and out[5]["t2"] == _t(4)
    assert out[5]["completed_steps"] == 3


def test_funnel_summary_is_monotone(spark):
    f = funnel(_events(spark), "user_id", "ts", "event_type",
               ["signup", "click", "purchase"])
    s = {r["step"]: r["n_users"] for r in funnel_summary(f, 3).collect()}
    assert s == {1: 4, 2: 3, 3: 2}


def test_cohort_retention_week_zero_equals_cohort_size(spark):
    rows = [
        (1, _t(1), "view"), (1, _t(10), "view"),   # cohort wk0, active wk0+wk1
        (2, _t(2), "view"),                        # cohort wk0 only
        (3, _t(10), "view"), (3, _t(24), "view"),  # cohort wk1, active wk1+wk3
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    ret = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
           for r in cohort_retention(df, "user_id", "ts").collect()}
    # 2024-01-01 is a Monday: days 1-7 → week 0 cohort, day 10 → next week
    assert ret[("2024-01-01", 0)] == 2
    assert ret[("2024-01-01", 1)] == 1
    assert ret[("2024-01-08", 0)] == 1
    assert ret[("2024-01-08", 2)] == 1


class TestTransitionMatrix:
    """Markov transitions: per-user sequencing, last-event exclusion,
    probability normalization."""

    def test_known_sequence(self, spark):
        import datetime as dt
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.behavior import transition_matrix
        t0 = dt.datetime(2024, 3, 1)
        rows = []
        # user 1: a->b->a->b ; user 2: a->a->c
        for i, s in enumerate(["a", "b", "a", "b"]):
            rows.append((1, t0 + dt.timedelta(minutes=i), i, s))
        for i, s in enumerate(["a", "a", "c"]):
            rows.append((2, t0 + dt.timedelta(minutes=i), 10 + i, s))
        df = spark.createDataFrame(rows, "u long, ts timestamp, eid long, st string")
        out = {(r["from_state"], r["to_state"]): (r["n_transitions"], r["p"])
               for r in transition_matrix(df, "u", "ts", "st", ["ts", "eid"]).collect()}
        assert out[("a", "b")] == (2, 0.5)
        assert out[("a", "a")] == (1, 0.25)
        assert out[("a", "c")] == (1, 0.25)
        assert out[("b", "a")] == (1, 1.0)
        assert ("b", "b") not in out and ("c", "a") not in out  # no cross-user

    def test_probabilities_sum_to_one_per_row(self, spark):
        import datetime as dt
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.behavior import transition_matrix
        t0 = dt.datetime(2024, 3, 1)
        rows = [(i % 7, t0 + dt.timedelta(minutes=i), i,
                 ["x", "y", "z"][(i * 5) % 3]) for i in range(200)]
        df = spark.createDataFrame(rows, "u long, ts timestamp, eid long, st string")
        out = transition_matrix(df, "u", "ts", "st", ["ts", "eid"]).collect()
        sums = {}
        for r in out:
            sums[r["from_state"]] = sums.get(r["from_state"], 0.0) + r["p"]
        for s, total in sums.items():
            assert abs(total - 1.0) < 1e-4, s


class TestSuppressRepeats:
    """Burst suppression: chained-gap episodes, one survivor each."""

    def test_chained_bursts_and_isolated_events(self, spark):
        import datetime as dt
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.behavior import suppress_repeats
        t0 = dt.datetime(2024, 3, 1)
        mins = [0, 5, 9, 60, 63, 200]   # burst {0,5,9}, burst {60,63}, lone {200}
        rows = [(1, t0 + dt.timedelta(minutes=m), i) for i, m in enumerate(mins)]
        rows.append((2, t0, 99))        # other key: independent episode
        df = spark.createDataFrame(rows, "k long, ts timestamp, eid long")
        out = suppress_repeats(df, ["k"], "ts", within_seconds=600,
                               order_cols=["ts", "eid"]).collect()
        kept = {(r["k"], r["eid"]): r["burst_id"] for r in out}
        assert kept == {(1, 0): 0, (1, 3): 1, (1, 5): 2, (2, 99): 0}

    def test_chain_outliving_window_is_one_episode(self, spark):
        import datetime as dt
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.behavior import suppress_repeats
        t0 = dt.datetime(2024, 3, 1)
        # 30 events 1 minute apart: total span 29 min >> window 120 s,
        # but every gap is small -> ONE episode survives
        rows = [(1, t0 + dt.timedelta(minutes=i), i) for i in range(30)]
        df = spark.createDataFrame(rows, "k long, ts timestamp, eid long")
        out = suppress_repeats(df, ["k"], "ts", within_seconds=120).collect()
        assert len(out) == 1 and out[0]["eid"] == 0
