"""Lake maintenance: small-file compaction and range-sorted (cluster-key)
layout.

Streaming ingest (the engine's Firehose analog, ``streaming/ingest.py``)
and frequent small appends leave a lake table as thousands of KB-sized
parquet files; at 100 TB that is the classic small-file problem — task
scheduling, footer reads and object-store requests dominate the scan.
Compaction rewrites a table into size-targeted files; range-sorted layout
additionally clusters rows by query keys so parquet min/max statistics
prune entire files (the poor man's Z-order — exact for 1-D key prefixes,
which covers the lake's dominant time-range scans).

Both use only the file-source `_metadata` hidden column and plain
DataFrame writes — no filesystem API, so they run identically against any
Hadoop-compatible store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file (file_path, file_size_bytes, n_rows) for a parquet table —
    the compaction decision input. Distributed: `_metadata.file_path` /
    `file_size` come from the scan itself (no driver-side listing)."""
    return (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size_bytes"),
        )
        .groupBy("file_path", "file_size_bytes")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def plan_compaction(
    spark: SparkSession, path: str, *, target_file_bytes: int = 128 << 20
) -> dict:
    """Decide the output file count for compacting ``path``: total bytes /
    target, min 1. Returns {"n_files", "total_bytes", "target_files"} —
    driver-side scalars derived from one tiny metadata aggregation."""
    row = (
        file_stats(spark, path)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("file_size_bytes").alias("total_bytes"),
        )
        .collect()[0]
    )
    total = row["total_bytes"] or 0
    return {
        "n_files": row["n_files"],
        "total_bytes": total,
        "target_files": max(1, -(-total // target_file_bytes)),
    }


def compact_files(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    *,
    target_file_bytes: int = 128 << 20,
    shuffle: bool = False,
) -> dict:
    """Rewrite ``src_path`` into ``dest_path`` as ~``target_file_bytes``
    files. ``shuffle=False`` (default) uses ``coalesce`` — a map-only merge
    of input splits, no exchange, the right mode for pure file-count
    reduction; ``shuffle=True`` uses ``repartition`` for even output sizes
    when the input is skewed (pays one round-robin exchange).

    Writes to a NEW path (atomic swap is the caller's rename/catalog
    repoint — never compact in place: readers of ``src_path`` keep a
    consistent view throughout). Returns the compaction plan dict.
    """
    plan = plan_compaction(spark, src_path, target_file_bytes=target_file_bytes)
    n = int(plan["target_files"])
    df = spark.read.parquet(src_path)
    df = df.repartition(n) if shuffle else df.coalesce(n)
    df.write.mode("error").parquet(dest_path)
    return plan


def write_range_sorted(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    num_files: int,
    mode: str = "error",
) -> None:
    """Write ``df`` range-partitioned + sorted on ``cluster_cols``: file i
    holds a contiguous, internally-sorted key range, so parquet row-group
    min/max statistics turn any point/range predicate on the leading key
    into file- and row-group-level skipping. One range exchange (sampled
    bounds) + local sort — the same cost profile as a global orderBy."""
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def z_order_value(col_a, col_b, *, bits: int = 16):
    """Morton (Z-order) value of two non-negative integer keys: their bits
    interleaved, so points close in BOTH dimensions are close on the curve.
    Pure bit arithmetic (shift/and/or chain — whole-stage codegen keeps it
    JVM-side); ``bits`` per dimension bounds the curve resolution. Keys
    must already be quantized to [0, 2^bits): rank/bucket continuous or
    skewed columns first."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def write_z_ordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    num_files: int,
    bits: int = 16,
    mode: str = "error",
) -> None:
    """Two-dimensional clustering: range-partition + sort on the Morton
    value of (col_a, col_b), so parquet min/max statistics prune files for
    predicates on EITHER key — the property 1-D sorting can't give (sorting
    on A makes B's per-file ranges span everything). The standard lakehouse
    OPTIMIZE ZORDER BY recipe, as plain DataFrame ops."""
    zed = df.withColumn("_z", z_order_value(col_a, col_b, bits=bits))
    (
        zed.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def targeted_delete(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    delete_keys: DataFrame,
    key_col: str,
) -> dict:
    """Right-to-be-forgotten delete that rewrites ONLY the files containing
    a target key — at 100 TB a GDPR erasure request must not become a
    full-lake rewrite.

    Three passes, all over slim data:

    1. locate: scan (key, ``_metadata.file_path``) and broadcast-join the
       (always small: it is an erasure request list) key set → the affected
       file list. On a range-sorted/Z-ordered layout (``write_range_sorted``)
       parquet min/max stats prune this scan to candidate files already.
    2. rewrite: read ONLY the affected files, anti-join the keys out, write
       them as replacement files under ``dest_path``.
    3. carry: untouched files are NOT read or rewritten — they are
       hard-linked (fallback: copied) into ``dest_path`` byte-identical.

    Write-to-new-path swap discipline as ``compact_files`` (readers of
    ``src_path`` stay consistent; the caller repoints atomically). Returns
    {files_total, files_rewritten, rows_deleted}.
    """
    import os
    import shutil

    keys = delete_keys.select(F.col(key_col).alias("_del_key")).distinct()
    located = (
        spark.read.parquet(src_path)
        .select(F.col(key_col), F.col("_metadata.file_path").alias("_file"))
        .join(F.broadcast(keys), F.col(key_col) == F.col("_del_key"), "inner")
        .select("_file")
        .distinct()
    )
    def _local(p: str) -> str:
        # Spark reports file:/path or file:///path depending on context
        return p.removeprefix("file://").removeprefix("file:")

    affected = sorted(_local(r["_file"]) for r in located.collect())
    all_files = sorted(
        os.path.join(src_path, f)
        for f in os.listdir(src_path)
        if f.endswith(".parquet")
    )
    os.makedirs(dest_path, exist_ok=True)

    rows_deleted = 0
    if affected:
        hit = spark.read.parquet(*affected)
        n_before = hit.count()
        survivors = hit.join(
            F.broadcast(keys), F.col(key_col) == F.col("_del_key"), "left_anti"
        )
        survivors.write.mode("append").parquet(dest_path)
        rows_deleted = n_before - survivors.count()

    affected_set = set(affected)
    for f in all_files:
        if f in affected_set:
            continue
        dst = os.path.join(dest_path, os.path.basename(f))
        try:
            os.link(f, dst)  # byte-identical carry, zero IO
        except OSError:
            shutil.copy2(f, dst)
    return {
        "files_total": len(all_files),
        "files_rewritten": len(affected),
        "rows_deleted": rows_deleted,
    }
