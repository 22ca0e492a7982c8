"""Stream-stream attribution join: streaming output equals the batch join
on the same data; out-of-window and wrong-key pairs never appear."""

import json

from pyspark.sql import types as T

from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.joins import (
    attribution_join,
    with_watermarks,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("tag", T.StringType()),
])


def _rows(kind):
    base = "2024-03-01T10:{m:02d}:00"
    if kind == "trig":
        return [
            {"k": 1, "ts": base.format(m=0), "tag": "i1"},
            {"k": 1, "ts": base.format(m=30), "tag": "i2"},
            {"k": 2, "ts": base.format(m=5), "tag": "i3"},
            {"k": 3, "ts": base.format(m=50), "tag": "i4"},
        ]
    return [
        {"k": 1, "ts": base.format(m=10), "tag": "c1"},   # joins i1
        {"k": 1, "ts": base.format(m=35), "tag": "c2"},   # joins i1(35m<60m) + i2
        {"k": 2, "ts": base.format(m=4), "tag": "c3"},    # BEFORE i3: no join
        {"k": 2, "ts": base.format(m=45), "tag": "c4"},   # joins i3 (40m later)
        {"k": 9, "ts": base.format(m=10), "tag": "c5"},   # key never triggered
    ]


def _mkdf(spark, rows):
    return spark.createDataFrame(
        [(r["k"], r["ts"].replace("T", " "), r["tag"]) for r in rows],
        "k long, ts string, tag string",
    ).selectExpr("k", "cast(ts as timestamp) as ts", "tag")


def _expected(spark):
    out = attribution_join(
        _mkdf(spark, _rows("trig")), _mkdf(spark, _rows("resp")),
        "k", within_seconds=3600,
    ).collect()
    return sorted((r["k"], r["t_tag"], r["r_tag"]) for r in out)


def test_batch_semantics(spark):
    got = _expected(spark)
    assert got == [
        (1, "i1", "c1"), (1, "i1", "c2"), (1, "i2", "c2"), (2, "i3", "c4"),
    ]


def test_stream_equals_batch(spark, tmp_path):
    tdir = tmp_path / "trig"; tdir.mkdir()
    rdir = tmp_path / "resp"; rdir.mkdir()
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    (tdir / "t.json").write_text(
        "\n".join(json.dumps(r) for r in _rows("trig")))
    (rdir / "r.json").write_text(
        "\n".join(json.dumps(r) for r in _rows("resp")))

    ts = spark.readStream.schema(SCHEMA).json(str(tdir))
    rs = spark.readStream.schema(SCHEMA).json(str(rdir))
    wt, wr = with_watermarks(ts, rs, delay_seconds=600)
    joined = attribution_join(wt, wr, "k", within_seconds=3600)
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r["k"], r["t_tag"], r["r_tag"])
        for r in spark.read.parquet(str(out_dir)).collect()
    )
    assert got == _expected(spark)
