"""Streaming CDC snapshot maintenance: changelog stream → live table."""

import json

from pyspark.sql import functions as F, types as T

from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.cdc import (
    read_live,
    read_snapshot,
    start_snapshot_maintenance,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("seq", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("v", T.StringType()),
])


def _write_batch(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run_available(spark, src, snap_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_snapshot_maintenance(
        stream, str(snap_dir), str(ckpt), ["k"], ["seq"], available_now=True
    )
    q.awaitTermination(120)


def test_snapshot_maintained_across_microbatches(spark, tmp_path):
    src = tmp_path / "changes"; src.mkdir()
    snap_dir = tmp_path / "snapshot"; snap_dir.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_batch(src, "b1.json", [
        {"k": 1, "seq": 1, "op": "U", "v": "a"},
        {"k": 2, "seq": 1, "op": "U", "v": "x"},
    ])
    _run_available(spark, src, snap_dir, ckpt)
    live = {r["k"]: r["v"] for r in
            read_live(spark, str(snap_dir), F.col("op") == "D").collect()}
    assert live == {1: "a", 2: "x"}

    # second batch: update k=1, tombstone k=2, add k=3
    _write_batch(src, "b2.json", [
        {"k": 1, "seq": 2, "op": "U", "v": "a2"},
        {"k": 2, "seq": 2, "op": "D", "v": None},
        {"k": 3, "seq": 1, "op": "U", "v": "new"},
    ])
    _run_available(spark, src, snap_dir, ckpt)
    live = {r["k"]: r["v"] for r in
            read_live(spark, str(snap_dir), F.col("op") == "D").collect()}
    assert live == {1: "a2", 3: "new"}
    # tombstone row is RETAINED in storage (late-data safety)...
    stored = {r["k"]: r["op"] for r in read_snapshot(spark, str(snap_dir)).collect()}
    assert stored[2] == "D"

    # ...so a LATE lower-seq upsert for the deleted key cannot resurrect it
    _write_batch(src, "b3.json", [
        {"k": 2, "seq": 1, "op": "U", "v": "stale"},
    ])
    _run_available(spark, src, snap_dir, ckpt)
    live = {r["k"]: r["v"] for r in
            read_live(spark, str(snap_dir), F.col("op") == "D").collect()}
    assert live == {1: "a2", 3: "new"}


def test_empty_start_returns_none(spark, tmp_path):
    assert read_snapshot(spark, str(tmp_path / "nope")) is None
