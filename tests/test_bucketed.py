"""Bucketed-layout tests: the join plan over two co-bucketed tables must be
exchange-free (the write paid the shuffle once; reads never pay it again)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.sources.bucketed import (
    bucketed_join_plan_is_colocated,
    write_bucketed,
)


@pytest.fixture
def bucket_env(spark):
    d = tempfile.mkdtemp(prefix="bucketed_")
    names = ("bt_orders", "bt_lineitem")
    yield d, names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    shutil.rmtree(d, ignore_errors=True)


def test_cobucketed_join_has_no_exchange(spark, sf_dir, bucket_env):
    d, (t_orders, t_line) = bucket_env
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, t_orders, ["o_orderkey"], 4,
                   sort_cols=["o_orderkey"], path=f"{d}/orders")
    write_bucketed(lineitem, t_line, ["l_orderkey"], 4,
                   sort_cols=["l_orderkey"], path=f"{d}/lineitem")

    # Force a sort-merge join (no broadcast) so the Exchange check is about
    # bucketing, not about the small test tables fitting the broadcast cap.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l = spark.table(t_line).withColumnRenamed("l_orderkey", "o_orderkey")
        joined = spark.table(t_orders).join(l, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # correctness: same row count as the plain (shuffling) join
        plain = spark.read.parquet(f"{sf_dir}/orders.parquet").join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, sf_dir, bucket_env):
    d, (t_orders, _) = bucket_env
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(orders, t_orders, ["o_orderkey"], 4, path=f"{d}/orders")
    agg = spark.table(t_orders).groupBy("o_orderkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_diagnostic_helper(spark, sf_dir, bucket_env):
    d, (t_orders, t_line) = bucket_env
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(orders, t_orders, ["o_orderkey"], 4, path=f"{d}/orders")
    write_bucketed(
        orders.select(F.col("o_orderkey"), F.col("o_orderdate")),
        t_line, ["o_orderkey"], 4, path=f"{d}/lineitem",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ok, plan = bucketed_join_plan_is_colocated(
            spark, t_orders, t_line, ["o_orderkey"]
        )
        assert ok, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
