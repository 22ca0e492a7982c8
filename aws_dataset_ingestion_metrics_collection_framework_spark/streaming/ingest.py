"""Streaming ingest — the Structured Streaming replacement for the
Kinesis → Firehose JSON→Parquet path (S4/S5, SURVEY §2.1;
ref:cdk_constructs/kinesis_construct.py:107-153).

The reference buffers 60 s / 64 MB in Firehose, converts OpenX-JSON to
Parquet against the Glue schema, writes time-partitioned prefixes, and
routes bad records to ``errorOutputPrefix`` (ref:stacks/metrics_streamer.py:90-91).
Here that whole managed chain is ONE streaming query:

    readStream(text/json lines) ──from_json(fixed schema)──►
    good/bad split ──foreachBatch──► partitioned parquet lake + errors path

``foreachBatch`` is used (rather than a direct file sink) because the split
has two sinks — the lake and the error route — and the reference's Firehose
semantics are per-buffer-flush atomic, which maps to per-micro-batch writes.
The 60 s buffering hint maps to ``trigger(processingTime="60 seconds")``;
tests use ``availableNow`` for determinism.

Scale: the stream is embarrassingly parallel (no shuffle — parse, derive
partition columns, write); throughput is bounded by parquet encode + object
store writes, which Spark scales linearly with executors. ``maxFilesPerTrigger``
bounds micro-batch size for backpressure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..sources.parquet_lake import (
    PARTITION_KEYS,
    overwrite_partitions,
    split_corrupt_json,
)


def read_json_lines_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based JSON-lines stream (the Kinesis-channel stand-in — any
    Spark streaming source with a string ``value`` column slots in here)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def open_stream_channel(spark: SparkSession, source: str, **options) -> DataFrame:
    """S4 source-adapter seam: every ingest channel normalizes to a stream
    with ONE string ``value`` column (a JSON record per row — the shape
    Kinesis put_records delivers, ref:lambda/metric_stream_producer.py), so
    the converting sink (``start_ingest``) is source-agnostic.

    Adapters:
    - ``file``   — JSON-lines directory (default test/dev channel);
      options: ``path``, ``max_files_per_trigger``.
    - ``socket`` — Spark's built-in TCP source (already one string ``value``
      per line); options: ``host``, ``port``.
    - ``kafka``  — the standard Kafka connector (value bytes → string);
      options: ``bootstrap_servers``, ``topic``, plus any ``kafka.*``
      passthroughs. Requires the spark-sql-kafka package on the classpath —
      a deploy-time concern, the plan shape is identical. A Kinesis channel
      deploys the same way via the spark-sql-kinesis connector with
      ``streamName``/``region`` options.

    New adapters are one ``elif``: produce a streaming DataFrame with a
    string ``value`` column and everything downstream (corrupt-row split,
    partitioned lake, scrape pipelines) applies unchanged.
    """
    if source == "file":
        return read_json_lines_stream(
            spark,
            options["path"],
            max_files_per_trigger=options.get("max_files_per_trigger"),
        )
    if source == "socket":
        return (
            spark.readStream.format("socket")
            .option("host", options.get("host", "localhost"))
            .option("port", options["port"])
            .load()
        )
    if source == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in kafka_channel_options(options).items():
            reader = reader.option(k, v)
        return reader.load().select(F.col("value").cast("string").alias("value"))
    raise ValueError(f"unknown stream source: {source!r} (file|socket|kafka)")


def kafka_channel_options(options: dict) -> dict[str, str]:
    """The exact option map the kafka adapter hands the connector — split
    out so the adapter contract is testable without spark-sql-kafka on the
    classpath: ``bootstrap_servers``/``topic`` map to the connector's
    ``kafka.bootstrap.servers``/``subscribe``, and any ``kafka.``-prefixed
    key passes through verbatim (auth, TLS, consumer tuning)."""
    out = {
        "kafka.bootstrap.servers": options["bootstrap_servers"],
        "subscribe": options["topic"],
    }
    for k, v in options.items():
        if k.startswith("kafka."):
            out[k] = v
    return out


def start_ingest(
    raw: DataFrame,
    schema: StructType,
    lake_path: str,
    errors_path: str,
    checkpoint_dir: str,
    *,
    value_col: str = "value",
    trigger_seconds: int | None = 60,
    available_now: bool = False,
    mirror_roots: list[str] | None = None,
) -> StreamingQuery:
    """Start the JSON→partitioned-Parquet converting sink (S5).

    Good rows (parse fully against ``schema``) land Hive-partitioned under
    ``lake_path``; unparseable rows land as text under ``errors_path``
    (the ``errorOutputPrefix`` analog). ``mirror_roots`` additionally fans
    each micro-batch out to the given catalog lake roots (the streaming
    face of the reference's N-catalog partition registration —
    ref:lambda/add_partition.py:56-71; pair with
    ``AccountRegistry.lake_roots``). Mirrors share the per-micro-batch
    atomicity of ``foreachBatch``: the batch is parsed once and re-encoded
    per root, never recomputed from the source.

    EXACTLY-ONCE ACROSS RESTART (r12): ``foreachBatch`` is at-least-once —
    a crash between a sink write and the checkpoint commit REPLAYS the
    batch, and a plain ``append`` would land its rows twice (the r12 chaos
    drill, tools/stream_soak.py --chaos, SIGKILLs the driver mid-batch and
    catches exactly this). Every sink write is therefore scoped to the
    micro-batch: good rows carry a trailing ``ingest_batch=<id>`` partition
    (dynamic partition overwrite — a replay rewrites exactly the same
    (partition keys…, ingest_batch) directories, never appends beside its
    own half-landed files), and error rows overwrite
    ``{errors_path}/ingest_batch=<id>``. The extra partition level is
    self-describing Hive layout: readers discover ``ingest_batch`` as one
    more int column and time-key pruning is unchanged (the batch level is
    BELOW the time keys); ~one directory per trigger per touched hour is
    the price of idempotent replay, and lake compaction can fold them.
    """
    spark = raw.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        good, bad = split_corrupt_json(spark, batch_df, value_col, schema)
        good = good.withColumn("ingest_batch", F.lit(batch_id).cast("int"))
        roots = [lake_path, *(mirror_roots or [])]
        if set(PARTITION_KEYS) <= set(good.columns):
            keys = [*PARTITION_KEYS, "ingest_batch"]
        else:
            keys = ["ingest_batch"]
        if len(roots) > 1:
            # parse once, re-encode per root (the mirrored-write contract)
            from pyspark import StorageLevel

            good = good.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            for root in roots:
                overwrite_partitions(good, root, keys)
        finally:
            if len(roots) > 1:
                good.unpersist()
        bad.write.mode("overwrite").text(f"{errors_path}/ingest_batch={batch_id}")

    writer = (
        raw.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
