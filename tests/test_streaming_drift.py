"""Streaming PSI monitor: stable batches score ~0, a shifted batch
scores above the action threshold, per-batch rows land in the log."""

import json

from pyspark.sql import types as T

from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.drift import (
    start_drift_monitor,
)

SCHEMA = T.StructType([T.StructField("value", T.DoubleType())])


def _write(src, name, vals):
    (src / name).write_text("\n".join(json.dumps({"value": float(v)}) for v in vals))


def _run(spark, src, log, ckpt, baseline):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_drift_monitor(
        stream, baseline, "value", str(log), str(ckpt),
        lo=0.0, hi=10.0, bins=10, available_now=True,
    )
    q.awaitTermination(120)


def test_stable_then_shifted_batches(spark, tmp_path):
    src = tmp_path / "in"; src.mkdir()
    log = tmp_path / "log"
    ckpt = tmp_path / "ckpt"
    base_vals = [i % 10 for i in range(500)]
    baseline = spark.createDataFrame([(float(v),) for v in base_vals], SCHEMA)

    _write(src, "b1.json", [i % 10 for i in range(300)])     # same shape
    _run(spark, src, log, ckpt, baseline)
    _write(src, "b2.json", [(i % 5) + 5 for i in range(300)])  # mass shifted up
    _run(spark, src, log, ckpt, baseline)

    rows = sorted(
        ((r["batch_id"], r["n_rows"], r["psi"])
         for r in spark.read.parquet(str(log)).collect())
    )
    assert len(rows) == 2
    assert rows[0][1] == 300 and rows[0][2] < 0.01    # stable batch
    assert rows[1][1] == 300 and rows[1][2] > 0.25    # actionable drift
