"""Bucketed table layout: pre-shuffled storage for co-located joins/aggs.

The single biggest repeated cost in a 100 TB lake is re-shuffling the same
fact table on the same key for every join: lineitem⋈orders on the order
key, events⋈events self-joins on user, metric datapoints⋈defs on metric
id. Spark's bucketing writes the shuffle INTO the layout once — files are
split by ``hash(key) % n`` with bucket metadata in the catalog — and every
later equi-join or aggregation on that key reads the buckets as already
co-partitioned: zero Exchange on either bucketed side, forever after.

This is the storage-level counterpart to the engine's other shuffle
eliminations (broadcast for small dims, AQE for skew): broadcast removes
the shuffle when one side is small, bucketing removes it when BOTH sides
are big and the join key is stable — exactly the reference's
lineitem/orders/events access pattern (SURVEY §2.4 J-family).

Bucket-count guidance at 100 TB: pick n so a single bucket of the LARGEST
bucketed table stays in executor-memory territory (~128-512 MB columnar),
and share n across tables joined together — Spark only elides both
exchanges when bucket counts match (or divide evenly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed by ``bucket_cols`` into
    ``num_buckets`` files per partition, optionally sorted within buckets
    (``sort_cols`` additionally elides the Sort below a sort-merge join).

    Bucketing requires ``saveAsTable`` (the bucket spec lives in the
    catalog, not in the files); ``path`` makes it an external table so the
    data directory outlives the session catalog.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join_plan_is_colocated(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> tuple[bool, str]:
    """Diagnostic: join the two bucketed tables on ``on`` and report
    whether the executed plan is exchange-free (True = co-located join;
    the string is the plan for inspection/logging)."""
    l, r = spark.table(left), spark.table(right)
    joined = l.join(r, on)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return ("Exchange" not in plan), plan
