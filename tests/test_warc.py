"""WARC/1.0 source: record framing, corrupt-record routing, gzip members,
and composition into the curation operators (Common-Crawl entry point)."""

import gzip

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    warc_bytes,
)

RECORDS = [
    {"url": "http://a.example/page", "date": "2026-01-01T00:00:00Z",
     "body": "hello WARC world"},
    {"url": "http://b.example/x", "date": "2026-01-02T00:00:00Z",
     "body": "unicode éè€ body", "status": 404},
    {"url": "http://a.example/other", "date": "2026-01-03T00:00:00Z",
     "body": "third document", "content_type": "text/html"},
]


def test_roundtrip(spark, tmp_path):
    (tmp_path / "f.warc").write_bytes(warc_bytes(RECORDS))
    good, bad = read_warc(spark, str(tmp_path / "f.warc"))
    rows = {r["url"]: r for r in good.collect()}
    assert bad.count() == 0
    assert len(rows) == 3
    r = rows["http://a.example/page"]
    assert r["warc_type"] == "response"
    assert r["http_status"] == 200
    assert r["text"] == "hello WARC world"
    assert r["n_bytes"] == len(b"hello WARC world")
    assert r["warc_date"] == "2026-01-01T00:00:00Z"
    assert r["mime"] == "application/http; msgtype=response"
    uni = rows["http://b.example/x"]
    assert uni["http_status"] == 404
    assert uni["text"] == "unicode éè€ body"
    assert uni["n_bytes"] == len("unicode éè€ body".encode())
    assert rows["http://a.example/other"]["content_type"] == "text/html"


def test_gzip_multimember(spark, tmp_path):
    # member-per-record, as crawlers emit .warc.gz
    blob = b"".join(gzip.compress(warc_bytes([r])) for r in RECORDS)
    (tmp_path / "f.warc.gz").write_bytes(blob)
    good, bad = read_warc(spark, str(tmp_path / "f.warc.gz"))
    assert bad.count() == 0
    assert sorted(r["url"] for r in good.collect()) == sorted(
        r["url"] for r in RECORDS
    )


def test_corrupt_records_routed_not_dropped(spark, tmp_path):
    valid = warc_bytes(RECORDS[:1])
    garbage = b"NOT-A-WARC-RECORD\r\njunk\r\n\r\n"
    truncated = warc_bytes(RECORDS[1:2])[:-20]  # cut mid-payload
    (tmp_path / "f.warc").write_bytes(garbage + valid + truncated)
    good, bad = read_warc(spark, str(tmp_path / "f.warc"))
    good_rows = good.collect()
    errors = [r["error"] for r in bad.collect()]
    # the valid record survives the resync past the garbage prefix
    assert [r["url"] for r in good_rows] == ["http://a.example/page"]
    assert len(errors) == 2
    assert any("bad version line" in e for e in errors)
    assert any("truncated payload" in e for e in errors)


def test_missing_content_length_routed():
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/\r\n\r\nbody\r\n\r\n")
    recs = list(parse_warc_records(raw, "mem"))
    assert recs[0]["error"] == "missing/invalid Content-Length"


def test_record_type_filter_and_payload_pruning(spark, tmp_path):
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Record-ID: <urn:uuid:req>\r\n"
           b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           b"WARC-Target-URI: http://a.example/page\r\n"
           b"Content-Length: 4\r\n\r\nGET \r\n\r\n")
    (tmp_path / "f.warc").write_bytes(req + warc_bytes(RECORDS[:1]))
    good, _bad = read_warc(spark, str(tmp_path / "f.warc"))
    assert [r["warc_type"] for r in good.collect()] == ["response"]
    assert "payload" not in good.columns  # pruned unless keep_payload
    with_payload, _ = read_warc(
        spark, str(tmp_path / "f.warc"), record_types=(), keep_payload=True
    )
    assert {r["warc_type"] for r in with_payload.collect()} == {
        "request", "response"
    }


def test_composes_into_curation(spark, tmp_path):
    """WARC → (doc_id, text) → domain extraction, the C4-pipeline shape."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import (
        extract_domains,
    )

    (tmp_path / "f.warc").write_bytes(warc_bytes(RECORDS))
    good, _ = read_warc(spark, str(tmp_path / "f.warc"))
    docs = good.select(
        F.col("record_id").alias("doc_id"),
        F.concat_ws(" ", "url", "text").alias("text"),
    )
    domains = {r["domain"] for r in extract_domains(docs, "doc_id", "text").collect()}
    assert {"a.example", "b.example"} <= domains


def test_streaming_warc_matches_batch(spark, tmp_path):
    """read_warc_stream over a landing dir produces exactly the batch
    reader's rows (same parser, exactly-once per file), including corrupt
    routing — one availableNow pass over two shards, one corrupt."""
    import os
    from aws_dataset_ingestion_metrics_collection_framework_spark.sources.warc import (
        read_warc, read_warc_stream, warc_bytes)

    land = tmp_path / "landing"; land.mkdir()
    recs = [{"url": f"http://s.example/{i}", "date": "2026-01-01T00:00:00Z",
             "body": f"payload {i}"} for i in range(10)]
    (land / "a.warc").write_bytes(warc_bytes(recs[:5]))
    (land / "b.warc").write_bytes(warc_bytes(recs[5:]))
    (land / "junk.warc").write_bytes(b"WARC/1.0\r\nbroken")

    good_b, bad_b = read_warc(spark, str(land))
    want = sorted((r["url"], r["text"]) for r in good_b.collect())
    want_bad = bad_b.count()

    good_s, bad_s = read_warc_stream(spark, str(land), max_files_per_trigger=1)
    out_good = str(tmp_path / "out_good"); out_bad = str(tmp_path / "out_bad")

    def route(batch, _bid):
        batch.persist()
        batch.filter(batch["error"].isNull()).drop("error", "payload") \
             .filter(batch["warc_type"] == "response") \
             .write.mode("append").parquet(out_good)
        batch.filter(batch["error"].isNotNull()) \
             .select("warc_file", "record_offset", "error") \
             .write.mode("append").parquet(out_bad)
        batch.unpersist()

    # drive the un-split parsed stream through one foreachBatch with both
    # sinks (the two-sink routing pattern start_ingest uses)
    from aws_dataset_ingestion_metrics_collection_framework_spark.sources import warc as W
    files = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    ).option("maxFilesPerTrigger", 1).load(str(land)).select("path", "content")
    parsed = files.mapInPandas(W._parse_mapper(), schema=W._PARSED_SCHEMA)
    q = parsed.writeStream.foreachBatch(route).trigger(availableNow=True) \
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)

    got = sorted((r["url"], r["text"])
                 for r in spark.read.parquet(out_good).collect())
    assert got == want
    assert spark.read.parquet(out_bad).count() == want_bad

    # the split helper on a streaming reader yields streaming frames
    assert good_s.isStreaming and bad_s.isStreaming
