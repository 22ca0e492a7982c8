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
