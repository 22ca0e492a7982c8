"""Scheme-aware marker/bookmark IO (sources/fsio): the same contracts
that already hold on plain local paths must hold through the Hadoop
FileSystem API — executed here over ``file://`` URIs, the scheme the
sandbox has (s3a/hdfs resolve through the identical FileSystem seam)."""

import json

from pyspark.sql import functions as F, types as T

from aws_dataset_ingestion_metrics_collection_framework_spark.sources import bookmarks as BM, fsio


def _uri(p) -> str:
    return "file://" + str(p)


class TestFsioPrimitives:
    def test_urljoin_preserves_scheme(self):
        assert fsio.urljoin("file:///a/b/", "c", "d") == "file:///a/b/c/d"
        assert fsio.urljoin("s3a://bucket/k", "_CURRENT") == (
            "s3a://bucket/k/_CURRENT"
        )
        # plain local paths keep os.path semantics
        assert fsio.urljoin("/a/b", "c") == "/a/b/c"

    def test_write_read_roundtrip_file_uri(self, spark, tmp_path):
        p = _uri(tmp_path / "meta" / "marker.txt")
        assert fsio.read_text(p, spark) is None
        fsio.write_text_atomic(p, "v1", spark)
        assert fsio.read_text(p, spark) == "v1"
        # overwrite commit (rename onto existing target)
        fsio.write_text_atomic(p, "v2", spark)
        assert fsio.read_text(p, spark) == "v2"
        # no torn .tmp left behind after the rename commit
        assert fsio.list_names(_uri(tmp_path / "meta"), spark) == ["marker.txt"]

    def test_exists_isdir_list_delete(self, spark, tmp_path):
        d = tmp_path / "dir"
        d.mkdir()
        (d / "a.txt").write_text("x")
        u = _uri(d)
        assert fsio.exists(u, spark) and fsio.is_dir(u, spark)
        assert fsio.list_names(u, spark) == ["a.txt"]
        assert not fsio.is_dir(_uri(d / "a.txt"), spark)
        fsio.delete(u, recursive=True, spark=spark)
        assert not fsio.exists(u, spark)
        assert fsio.list_names(u, spark) == []

    def test_unicode_payload(self, spark, tmp_path):
        p = _uri(tmp_path / "u.json")
        payload = json.dumps({"watermark": "2024-01-01T00:00:00 ▁é"})
        fsio.write_text_atomic(p, payload, spark)
        assert json.loads(fsio.read_text(p, spark)) == json.loads(payload)

    def test_rename_refuses_existing_destination(self, spark, tmp_path):
        """rename must refuse an existing dst on EVERY filesystem: POSIX
        rename would replace a file and Hadoop's FileSystem.rename would
        silently NEST src into an existing dst directory — both are
        swap-protocol corruption, not moves. Verified on both the local
        fast path and the Hadoop file:// path."""
        import pytest

        for mk in (str, _uri):  # local branch, then Hadoop branch
            tag = "l" if mk is str else "h"
            src_d = tmp_path / f"src_{tag}"
            dst_d = tmp_path / f"dst_{tag}"
            src_d.mkdir()
            dst_d.mkdir()
            (src_d / "x.txt").write_text("x")
            with pytest.raises(OSError, match="destination exists"):
                fsio.rename(mk(src_d), mk(dst_d), spark=spark)
            # src untouched, dst NOT nested into
            assert (src_d / "x.txt").exists()
            assert not (dst_d / f"src_{tag}").exists()
            # a clean move still works once dst is out of the way
            fsio.delete(mk(dst_d), spark=spark)
            fsio.rename(mk(src_d), mk(dst_d), spark=spark)
            assert (dst_d / "x.txt").exists() and not src_d.exists()

    def test_create_text_exclusive_wins_once(self, spark, tmp_path):
        """The lease primitive: exactly one creator wins; the loser gets
        False and the winner's content is intact (never truncated by the
        losing attempt). Both the local O_CREAT|O_EXCL branch and the
        Hadoop create(overwrite=false) branch."""
        for mk in (str, _uri):
            tag = "l" if mk is str else "h"
            p = mk(tmp_path / f"lease_{tag}" / "owner")
            assert fsio.create_text_exclusive(p, "first", spark=spark) is True
            assert fsio.create_text_exclusive(p, "second", spark=spark) is False
            assert fsio.read_text(p, spark=spark) == "first"


class TestJsonDirDataset:
    """write_json_dir/read_json_dir — the no-Spark-job manifest I/O the
    ANN index families use. The layout contract is the load-bearing part:
    both functions must stay interchangeable with Spark's own JSON
    directory reader/writer, or pre-existing indexes (Spark-written) and
    new indexes (fsio-written) stop being mutually readable."""

    REC = {"format": "ivf", "version": 1, "n_lists": 16,
           "corpus_id": "id", "vec_col": "vec"}

    def test_roundtrip_and_spark_cross_compat(self, spark, tmp_path):
        import pytest

        for mk in (str, _uri):  # local branch, then Hadoop branch
            tag = "l" if mk is str else "h"
            p = mk(tmp_path / f"meta_{tag}")
            fsio.write_json_dir(p, self.REC, spark=spark)
            # our reader
            assert fsio.read_json_dir(p, spark=spark) == self.REC
            # Spark's reader sees the identical record (old load paths)
            row = spark.read.json(p).first()
            assert {k: row[k] for k in self.REC} == self.REC
            # layout is the coalesce(1).write.json shape incl. _SUCCESS
            names = sorted(fsio.list_names(p, spark=spark))
            assert names[0] == "_SUCCESS"
            assert len(names) == 2 and names[1].startswith("part-")
            # mode='error' refuses an existing tree, like DataFrameWriter
            with pytest.raises(OSError, match="PATH_ALREADY_EXISTS"):
                fsio.write_json_dir(p, self.REC, spark=spark)

    def test_reads_spark_written_tree(self, spark, tmp_path):
        """Backward compat: a manifest written by Spark itself (every
        index persisted before this round) must read through the new
        driver-side path with identical values."""
        from pyspark.sql import Row

        p = str(tmp_path / "sparkmeta")
        spark.createDataFrame([Row(**self.REC)]).coalesce(1) \
            .write.json(p)
        got = fsio.read_json_dir(p, spark=spark)
        assert {k: got[k] for k in self.REC} == self.REC

    def test_modes(self, spark, tmp_path):
        p = str(tmp_path / "meta")
        fsio.write_json_dir(p, {"v": 1}, spark=spark)
        fsio.write_json_dir(p, {"v": 2}, mode="ignore", spark=spark)
        assert fsio.read_json_dir(p, spark=spark) == {"v": 1}
        fsio.write_json_dir(p, {"v": 3}, mode="overwrite", spark=spark)
        assert fsio.read_json_dir(p, spark=spark) == {"v": 3}
        # append adds a second part; read returns the FIRST record,
        # matching spark.read.json(path).first() on a multi-part tree
        fsio.write_json_dir(p, {"v": 4}, mode="append", spark=spark)
        names = [n for n in fsio.list_names(p, spark=spark)
                 if n.startswith("part-")]
        assert len(names) == 2
        assert fsio.read_json_dir(p, spark=spark) == {"v": 3}

    def test_missing_dir_raises_path_not_found(self, spark, tmp_path):
        import pytest

        with pytest.raises(FileNotFoundError, match="PATH_NOT_FOUND"):
            fsio.read_json_dir(str(tmp_path / "absent"), spark=spark)


class TestBookmarksOverFileUri:
    def test_advance_load_roundtrip(self, spark, tmp_path):
        bmdir = _uri(tmp_path / "bm")
        assert BM.load(bmdir, "job", spark) is None
        BM.advance(bmdir, "job", "2024-01-05", spark)
        assert BM.load(bmdir, "job", spark) == "2024-01-05"
        BM.advance(bmdir, "job", "2024-01-09", spark)
        assert BM.load(bmdir, "job", spark) == "2024-01-09"

    def test_incremental_slice_never_skips_never_repeats(self, spark, tmp_path):
        bmdir = _uri(tmp_path / "bm")
        df = spark.createDataFrame(
            [(i, f"r{i}") for i in range(10)], ["ts", "v"]
        )
        fresh, hi = BM.incremental_slice(df, "ts", bmdir, "job")
        assert fresh.count() == 10
        BM.advance(bmdir, "job", fresh.agg(hi).collect()[0][0], spark)
        fresh2, _ = BM.incremental_slice(df, "ts", bmdir, "job")
        assert fresh2.count() == 0  # closed-open: bound row not replayed


class TestSnapshotMaintenanceOverFileUri:
    """The full streaming CDC lifecycle with the snapshot addressed by a
    file:// URI — marker commit, repoint, prune and the replay no-op
    guard all through the Hadoop FileSystem API."""

    SCHEMA = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("v", T.StringType()),
    ])

    def _run(self, spark, src, snap_uri, ckpt, **kw):
        from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.cdc import (
            start_snapshot_maintenance,
        )

        stream = spark.readStream.schema(self.SCHEMA).json(str(src))
        q = start_snapshot_maintenance(
            stream, snap_uri, str(ckpt), ["k"], ["seq"],
            available_now=True, **kw,
        )
        q.awaitTermination(120)

    def test_maintenance_and_replay_guard(self, spark, tmp_path):
        import shutil

        from aws_dataset_ingestion_metrics_collection_framework_spark.streaming import cdc as scdc

        src = tmp_path / "changes"; src.mkdir()
        snap_uri = _uri(tmp_path / "snapshot")
        ckpt = tmp_path / "ckpt"

        (src / "b1.json").write_text("\n".join(
            json.dumps(r) for r in [
                {"k": 1, "seq": 1, "op": "U", "v": "a"},
                {"k": 2, "seq": 1, "op": "U", "v": "x"},
            ]
        ))
        self._run(spark, src, snap_uri, ckpt)
        assert scdc._current_version(snap_uri, spark) == "_v0"
        live = {r["k"]: r["v"] for r in scdc.read_live(
            spark, snap_uri, F.col("op") == "D").collect()}
        assert live == {1: "a", 2: "x"}

        # second batch through the same URI path: update + tombstone
        (src / "b2.json").write_text("\n".join(
            json.dumps(r) for r in [
                {"k": 1, "seq": 2, "op": "U", "v": "a2"},
                {"k": 2, "seq": 2, "op": "D", "v": None},
            ]
        ))
        self._run(spark, src, snap_uri, ckpt)
        live = {r["k"]: r["v"] for r in scdc.read_live(
            spark, snap_uri, F.col("op") == "D").collect()}
        assert live == {1: "a2"}
        # prune kept {current, previous} — via the FS API listing
        names = [n for n in fsio.list_names(snap_uri, spark)
                 if n.startswith("_v")]
        assert sorted(names) == ["_v0", "_v1"]

        # crash between marker repoint and checkpoint commit → replay no-op
        shutil.rmtree(ckpt)
        before = {r["k"]: (r["seq"], r["v"]) for r in scdc.read_snapshot(
            spark, snap_uri).collect()}
        self._run(spark, src, snap_uri, ckpt)  # re-delivers as batch_id 0
        assert scdc._current_version(snap_uri, spark) == "_v0"
        after = {r["k"]: (r["seq"], r["v"]) for r in scdc.read_snapshot(
            spark, snap_uri).collect()}
        assert after == before


class TestRetentionGC:
    """keep_history=True + retain_versions bounds the time-travel window
    (ADVICE: unbounded growth otherwise — one full snapshot per batch)."""

    SCHEMA = TestSnapshotMaintenanceOverFileUri.SCHEMA

    def test_history_bounded_to_retain_versions(self, spark, tmp_path):
        from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.cdc import (
            list_versions,
            read_snapshot_at,
            start_snapshot_maintenance,
        )

        src = tmp_path / "changes"; src.mkdir()
        snap_dir = str(tmp_path / "snapshot")
        ckpt = tmp_path / "ckpt"

        for i in range(5):
            (src / f"b{i}.json").write_text(json.dumps(
                {"k": 1, "seq": i + 1, "op": "U", "v": f"v{i}"}
            ))
            stream = spark.readStream.schema(self.SCHEMA).json(str(src))
            q = start_snapshot_maintenance(
                stream, snap_dir, str(ckpt), ["k"], ["seq"],
                available_now=True, keep_history=True, retain_versions=3,
            )
            q.awaitTermination(120)

        versions = list_versions(snap_dir)
        assert len(versions) == 3, versions  # bounded, not 5
        assert versions == sorted(versions)[-3:]
        # newest retained version still reads correctly; pruned one is gone
        newest = {r["k"]: r["v"] for r in read_snapshot_at(
            spark, snap_dir, versions[-1]).collect()}
        assert newest == {1: "v4"}
        assert read_snapshot_at(spark, snap_dir, versions[0] - 1) is None

    def test_retain_floor_of_two(self, spark, tmp_path):
        """retain_versions=1 still keeps the predecessor (reader safety)."""
        from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.cdc import (
            list_versions,
            start_snapshot_maintenance,
        )

        src = tmp_path / "changes"; src.mkdir()
        snap_dir = str(tmp_path / "snapshot")
        ckpt = tmp_path / "ckpt"
        for i in range(3):
            (src / f"b{i}.json").write_text(json.dumps(
                {"k": 1, "seq": i + 1, "op": "U", "v": f"v{i}"}
            ))
            stream = spark.readStream.schema(self.SCHEMA).json(str(src))
            q = start_snapshot_maintenance(
                stream, snap_dir, str(ckpt), ["k"], ["seq"],
                available_now=True, keep_history=True, retain_versions=1,
            )
            q.awaitTermination(120)
        assert len(list_versions(snap_dir)) == 2
