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


def test_versions_pruned_to_current_plus_previous(spark, tmp_path):
    """Each commit prunes superseded _v* dirs, keeping {current, previous}
    so a reader that resolved the marker pre-repoint still has its files."""
    src = tmp_path / "changes"; src.mkdir()
    snap_dir = tmp_path / "snapshot"; snap_dir.mkdir()
    ckpt = tmp_path / "ckpt"

    for i in range(3):
        _write_batch(src, f"b{i}.json", [
            {"k": 1, "seq": i + 1, "op": "U", "v": f"v{i}"},
            {"k": 10 + i, "seq": 1, "op": "U", "v": "x"},
        ])
        _run_available(spark, src, snap_dir, ckpt)

    versions = sorted(p.name for p in snap_dir.iterdir() if p.name.startswith("_v"))
    assert len(versions) == 2, versions  # current + one predecessor only
    live = {r["k"]: r["v"] for r in
            read_live(spark, str(snap_dir), F.col("op") == "D").collect()}
    assert live == {1: "v2", 10: "x", 11: "x", 12: "x"}


def test_replayed_batch_is_noop(spark, tmp_path):
    """Crash between marker repoint and checkpoint commit: the micro-batch
    is re-delivered with the SAME batch_id while the marker already points
    at _v{batch_id}. The real merge_batch must detect this and no-op —
    previously it raised 'Cannot overwrite a path that is also being read
    from', permanently wedging the stream.

    Simulated by running batch 0 normally, then rolling the checkpoint back
    (delete it) while leaving the snapshot committed: the rerun re-delivers
    the same data as batch_id 0, which the marker already names."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.streaming import cdc as scdc
    import shutil

    src = tmp_path / "changes"; src.mkdir()
    snap_dir = tmp_path / "snapshot"; snap_dir.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_batch(src, "b1.json", [
        {"k": 1, "seq": 1, "op": "U", "v": "a"},
        {"k": 2, "seq": 1, "op": "U", "v": "x"},
    ])
    _run_available(spark, src, snap_dir, ckpt)
    assert scdc._current_version(str(snap_dir)) == "_v0"
    before = {r["k"]: r["v"] for r in read_snapshot(spark, str(snap_dir)).collect()}

    # crash scenario: snapshot committed (marker → _v0) but checkpoint lost
    shutil.rmtree(ckpt)
    _run_available(spark, src, snap_dir, ckpt)  # re-delivers batch_id 0

    # stream completed (no overwrite-while-reading error), snapshot intact
    assert scdc._current_version(str(snap_dir)) == "_v0"
    after = {r["k"]: r["v"] for r in read_snapshot(spark, str(snap_dir)).collect()}
    assert after == before


def test_time_travel_reads_as_of_batch(spark, tmp_path):
    """keep_history=True retains every version; read_snapshot_at pins the
    newest commit at-or-before the requested batch id (lake AS-OF)."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.cdc import (
        list_versions,
        read_snapshot_at,
        start_snapshot_maintenance,
    )

    src = tmp_path / "changes"; src.mkdir()
    snap_dir = tmp_path / "snapshot"; snap_dir.mkdir()
    ckpt = tmp_path / "ckpt"

    def run(batch_rows, name):
        _write_batch(src, name, batch_rows)
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_snapshot_maintenance(
            stream, str(snap_dir), str(ckpt), ["k"], ["seq"],
            available_now=True, keep_history=True,
        )
        q.awaitTermination(120)

    run([{"k": 1, "seq": 1, "op": "U", "v": "a"}], "b1.json")
    run([{"k": 1, "seq": 2, "op": "U", "v": "b"},
         {"k": 2, "seq": 1, "op": "U", "v": "x"}], "b2.json")

    versions = list_versions(str(snap_dir))
    assert len(versions) == 2
    v0, v1 = versions

    at0 = {r["k"]: r["v"] for r in read_snapshot_at(spark, str(snap_dir), v0).collect()}
    assert at0 == {1: "a"}
    # as-of between commits pins the earlier one; as-of latest sees both keys
    at_mid = {r["k"]: r["v"]
              for r in read_snapshot_at(spark, str(snap_dir), v1 - 1).collect()}
    assert at_mid == {1: "a"}
    at1 = {r["k"]: r["v"] for r in read_snapshot_at(spark, str(snap_dir), v1).collect()}
    assert at1 == {1: "b", 2: "x"}
    assert read_snapshot_at(spark, str(snap_dir), v0 - 1) is None
