"""Lake-maintenance tests: compaction and range-sorted layout."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.sources.maintenance import (
    compact_files,
    file_stats,
    plan_compaction,
    write_range_sorted,
    write_z_ordered,
    z_order_value,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="maint_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_compaction_reduces_file_count_preserving_rows(spark, tmpdir):
    src, dest = f"{tmpdir}/src", f"{tmpdir}/dest"
    spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(64).write.parquet(src)
    assert file_stats(spark, src).count() == 64
    plan = compact_files(spark, src, dest, target_file_bytes=1 << 30)
    assert plan["n_files"] == 64
    out_files = file_stats(spark, dest)
    assert out_files.count() == 1
    assert spark.read.parquet(dest).count() == 10_000
    assert (
        spark.read.parquet(dest).agg(F.sum("v")).collect()[0][0]
        == spark.read.parquet(src).agg(F.sum("v")).collect()[0][0]
    )


def test_plan_compaction_targets_size(spark, tmpdir):
    src = f"{tmpdir}/src"
    spark.range(50_000).withColumn("pad", F.sha2(F.col("id").cast("string"), 256)) \
        .repartition(16).write.parquet(src)
    plan = plan_compaction(spark, src, target_file_bytes=1 << 20)
    # ceil(total/1MiB) files, at least 1, fewer than the 16 inputs
    assert 1 <= plan["target_files"] <= 16
    assert plan["target_files"] == -(-plan["total_bytes"] // (1 << 20))


def test_z_order_value_interleaves_bits(spark):
    rows = spark.range(1).select(
        z_order_value(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    ).collect()
    # a=101, b=011 → z bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 27
    assert rows[0]["z"] == 0b011011


def test_z_order_prunes_both_dimensions(spark, tmpdir):
    # uniform 256×256 grid; after Z-ordering into 16 files, a narrow band
    # on EITHER dimension must be absent from most files (1-D sort can
    # only ever give that for its leading key)
    df = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    path = f"{tmpdir}/zorder"
    write_z_ordered(df, path, "x", "y", num_files=16, bits=8)
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.col("_metadata.file_path").alias("f"))
        .agg(F.min("x").alias("x_lo"), F.max("x").alias("x_hi"),
             F.min("y").alias("y_lo"), F.max("y").alias("y_hi"))
        .collect()
    )
    assert len(per_file) == 16
    # a file-skipping reader keeps only files whose [lo, hi] overlaps the
    # predicate band; both dimensions must prune meaningfully
    x_hits = sum(1 for r in per_file if r["x_lo"] <= 10 and r["x_hi"] >= 0)
    y_hits = sum(1 for r in per_file if r["y_lo"] <= 10 and r["y_hi"] >= 0)
    assert x_hits <= 8 and y_hits <= 8
    assert spark.read.parquet(path).count() == 256 * 256


def test_range_sorted_files_have_disjoint_key_ranges(spark, tmpdir):
    path = f"{tmpdir}/sorted"
    df = spark.range(20_000).select(
        (F.xxhash64("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    write_range_sorted(df, path, ["k"], num_files=8)
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.col("_metadata.file_path").alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in per_file) == 20_000
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # contiguous, non-overlapping key ranges


class TestTargetedDelete:
    def test_only_affected_files_rewritten(self, spark, tmp_path):
        import os
        from aws_dataset_ingestion_metrics_collection_framework_spark.sources.maintenance import (
            targeted_delete, write_range_sorted)
        src = str(tmp_path / "src")
        dest = str(tmp_path / "dest")
        df = spark.createDataFrame([(i, f"u{i % 50}") for i in range(2000)],
                                   "row long, user string")
        # range-sorted on user -> each user confined to few files
        write_range_sorted(df, src, ["user"], num_files=8)
        before = {f: os.stat(os.path.join(src, f)).st_ino
                  for f in os.listdir(src) if f.endswith(".parquet")}

        victims = spark.createDataFrame([("u3",), ("u4",)], "user string")
        plan = targeted_delete(spark, src, dest, victims, "user")

        assert plan["rows_deleted"] == 80                    # 2 users x 40 rows
        assert 0 < plan["files_rewritten"] < plan["files_total"]
        out = spark.read.parquet(dest)
        assert out.filter(F.col("user").isin("u3", "u4")).count() == 0
        assert out.count() == 2000 - 80
        # carried files are the SAME inode (zero-IO hard link)
        carried = [f for f in os.listdir(dest)
                   if f.endswith(".parquet") and f in before]
        assert carried
        for f in carried:
            assert os.stat(os.path.join(dest, f)).st_ino == before[f]

    def test_no_hits_carries_everything(self, spark, tmp_path):
        from aws_dataset_ingestion_metrics_collection_framework_spark.sources.maintenance import targeted_delete
        src = str(tmp_path / "s2"); dest = str(tmp_path / "d2")
        spark.createDataFrame([(1, "a"), (2, "b")], "row long, user string") \
             .repartition(2).write.parquet(src)
        plan = targeted_delete(spark, src, dest,
                               spark.createDataFrame([("zz",)], "user string"), "user")
        assert plan["files_rewritten"] == 0 and plan["rows_deleted"] == 0
        assert spark.read.parquet(dest).count() == 2


class TestOverwritePartitions:
    """Dynamic partition overwrite: only touched partitions rewrite."""

    def test_untouched_partitions_survive(self, spark, tmp_path):
        from aws_dataset_ingestion_metrics_collection_framework_spark.sources.parquet_lake import (
            overwrite_partitions,
        )
        p = str(tmp_path / "lake")
        base = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 11), (3, "b", 12)], "id long, part string, v long"
        )
        overwrite_partitions(base, p, ["part"])
        # restate partition b (new content) and add partition c
        patch = spark.createDataFrame(
            [(9, "b", 99), (4, "c", 13)], "id long, part string, v long"
        )
        overwrite_partitions(patch, p, ["part"])
        rows = {(r["part"], r["id"]): r["v"]
                for r in spark.read.parquet(p).collect()}
        assert rows == {
            ("a", 1): 10, ("a", 2): 11,      # untouched partition intact
            ("b", 9): 99,                     # b fully replaced (3 gone)
            ("c", 4): 13,                     # new partition appended
        }

    def test_replay_is_idempotent(self, spark, tmp_path):
        from aws_dataset_ingestion_metrics_collection_framework_spark.sources.parquet_lake import (
            overwrite_partitions,
        )
        p = str(tmp_path / "lake")
        batch = spark.createDataFrame(
            [(1, "x", 1), (2, "y", 2)], "id long, part string, v long"
        )
        overwrite_partitions(batch, p, ["part"])
        overwrite_partitions(batch, p, ["part"])  # at-least-once replay
        assert spark.read.parquet(p).count() == 2
