"""Partitioned Parquet lake writer/reader — replaces Kinesis→Firehose→S3 +
add_partition (S4/S5/S6, ref:cdk_constructs/kinesis_construct.py:107-153,
ref:lambda/add_partition.py:8-71).

Spark writes Hive-style partition paths (``region=.../year=.../...``) that
``spark.read.parquet`` discovers natively — the entire event-driven partition
registration lambda disappears (SURVEY §1.2). Partition layout matches the
reference's 5-level scheme (region/year/month/day/hour —
ref:cdk_constructs/glue_catalog_construct.py:52-67) giving the same pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PARTITION_KEYS = ("region", "year", "month", "day", "hour")


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write a §1.3-shaped table partitioned by the 5 lake keys.

    ``maxRecordsPerFile`` bounds file size (the Firehose 64 MB buffer analog);
    at 100 TB, AQE coalescing keeps per-partition file counts sane.
    """
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*PARTITION_KEYS)
        .parquet(path)
    )


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Idempotent partition-level rewrite: replace ONLY the partitions
    present in `df`, leaving every other partition untouched — the
    backfill/restatement write a partitioned lake needs ('recompute
    2024-01-15 for all accounts' must not truncate the rest of the
    table, which is what a plain overwrite does under STATIC partition-
    overwrite mode).

    Implemented with Spark's dynamic partitionOverwriteMode, scoped to
    this ONE write via the DataFrameWriter option (never the session
    config — a session-wide flip silently changes the semantics of every
    other overwrite in the job). Re-running the same batch rewrites the
    same partitions to the same content: safe under at-least-once
    schedulers."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_partitioned_mirrored(
    df: DataFrame,
    roots: list[str],
    *,
    mode: str = "append",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Mirror the partitioned write to every catalog lake root.

    The reference fans each new partition out to N Glue *catalog* accounts
    (ref:lambda/add_partition.py:56-71, ref:stacks/centralized_resources.py:
    118-140) — N metadata registrations over one S3 location. An
    engine-native lake has no shared object store to alias, so the analog is
    N data mirrors: the input is materialized ONCE (persist to memory/disk)
    and the upstream plan — potentially a 100 TB scrape — is never
    recomputed per root; each mirror write is then a map-only re-encode of
    the cached partitions.
    """
    if not roots:
        raise ValueError("write_partitioned_mirrored needs at least one root")
    if len(roots) == 1:
        write_partitioned(df, roots[0], mode=mode, max_records_per_file=max_records_per_file)
        return
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for root in roots:
            write_partitioned(df, root, mode=mode, max_records_per_file=max_records_per_file)
    finally:
        df.unpersist()


def read_lake_table(spark: SparkSession, path: str) -> DataFrame:
    """Scan with partition discovery; predicate pushdown on partition keys
    gives the same pruning as Glue partition filtering."""
    return spark.read.parquet(path)


def split_corrupt_json(spark: SparkSession, raw: DataFrame, value_col: str, schema) -> tuple[DataFrame, DataFrame]:
    """JSON → typed split: good rows parse against the fixed schema, bad rows
    route to an error output — the Firehose ``errorOutputPrefix`` analog
    (ref:stacks/metrics_streamer.py:91).

    PERMISSIVE ``from_json`` yields an all-NULL struct (not NULL) for
    malformed input, so detection needs an explicit ``_corrupt_record``
    column appended to the parse schema; empty/whitespace rows come back as
    a NULL struct and are dropped (Firehose likewise ignores empty records).
    """
    from pyspark.sql import types as T

    parse_schema = T.StructType(list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())])
    parsed = raw.withColumn(
        "_parsed",
        F.from_json(F.col(value_col), parse_schema, {"columnNameOfCorruptRecord": "_corrupt_record"}),
    )
    good = (
        parsed.filter(F.col("_parsed").isNotNull() & F.col("_parsed._corrupt_record").isNull())
        .select("_parsed.*")
        .drop("_corrupt_record")
    )
    bad = parsed.filter(F.col("_parsed._corrupt_record").isNotNull()).select(
        F.col(value_col).alias("raw")
    )
    return good, bad


def apply_retention(
    spark: SparkSession, path: str, *, max_age_days: int, today=None
) -> DataFrame:
    """Retention tiering (minute=2d / hour=30d / day=90d —
    ref:stacks/centralized_resources.py:47-65) as a partition-pruned
    anti-filter: returns the surviving rows; callers overwrite or use
    dynamic partition overwrite. Partition pruning means only the doomed
    partitions' metadata is touched on the read side."""
    df = spark.read.parquet(path)
    today_expr = F.lit(today).cast("date") if today is not None else F.current_date()
    cutoff = F.date_sub(today_expr, max_age_days)
    return df.filter(
        F.make_date(F.col("year").cast("int"), F.col("month").cast("int"), F.col("day").cast("int"))
        >= cutoff
    )
