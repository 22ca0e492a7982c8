"""Streaming rollup maintenance: event stream folded into persisted
aggregate state; any micro-batching must equal a one-shot batch recompute."""

import json

from pyspark.sql import types as T

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.rollup import (
    finalize_rollup,
    rollup_partials,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.rollup import (
    read_rollup,
    start_rollup_maintenance,
)

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("v", T.DoubleType()),
])


def _rows(i0, n):
    return [
        {"k": f"g{i % 2}", "ts": f"2024-03-{1 + (i % 3):02d}T{i % 24:02d}:00:00",
         "v": float(i) / 2}
        for i in range(i0, i0 + n)
    ]


def _write_batch(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run_available(spark, src, state_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_rollup_maintenance(
        stream, str(state_dir), str(ckpt), ["k"], "ts", "v",
        available_now=True,
    )
    q.awaitTermination(120)


def _final_set(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_across_microbatches(spark, tmp_path):
    src = tmp_path / "events"; src.mkdir()
    state = tmp_path / "state"; state.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_batch(src, "b1.json", _rows(0, 20))
    _run_available(spark, src, state, ckpt)
    _write_batch(src, "b2.json", _rows(20, 15))
    _write_batch(src, "b3.json", _rows(35, 7))
    _run_available(spark, src, state, ckpt)

    got = _final_set(read_rollup(spark, str(state)))

    all_df = spark.createDataFrame(
        [(r["k"], r["ts"].replace("T", " "), r["v"]) for r in _rows(0, 42)],
        "k string, ts string, v double",
    ).selectExpr("k", "cast(ts as timestamp) AS ts", "v")
    want = _final_set(finalize_rollup(rollup_partials(all_df, ["k"], "ts", "v")))
    assert got == want


def test_late_event_folds_into_old_window(spark, tmp_path):
    """No watermark cutoff: an event for a long-past window still lands in
    that window's row (parquet state has no lateness bound)."""
    src = tmp_path / "events"; src.mkdir()
    state = tmp_path / "state"; state.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_batch(src, "b1.json",
                 [{"k": "g", "ts": "2024-03-05T10:00:00", "v": 1.0}])
    _run_available(spark, src, state, ckpt)
    _write_batch(src, "b2.json",
                 [{"k": "g", "ts": "2023-01-01T00:00:00", "v": 5.0}])  # very late
    _run_available(spark, src, state, ckpt)

    rows = {str(r["window_start"]): r["cnt"]
            for r in read_rollup(spark, str(state)).collect()}
    assert rows == {"2024-03-05 00:00:00": 1, "2023-01-01 00:00:00": 1}


def test_read_before_first_commit_is_none(spark, tmp_path):
    assert read_rollup(spark, str(tmp_path / "nothing")) is None
