"""Streaming exact dedup — the continuous-ingest counterpart of
``operators.dedup.exact_dedup`` (training pipelines dedup at ingest time so
duplicates never land in the lake).

Built on ``dropDuplicatesWithinWatermark``: state holds one entry per
distinct key seen within the watermark horizon and the watermark evicts
older entries, so state is bounded by (dedup horizon × arrival rate) —
never by stream length. One shuffle on the dedup key per micro-batch;
late rows beyond the watermark are dropped by the engine upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..sources import fsio


def dedup_stream(
    df: DataFrame,
    content_cols: list[str],
    *,
    event_time_col: str,
    watermark: str = "10 minutes",
    hash_only: bool = False,
) -> DataFrame:
    """Keep the first arrival of each distinct content within the watermark
    horizon.

    Default keys state on the content columns themselves — exact, like the
    batch operator's collision-safe contract. ``hash_only=True`` keys on
    xxhash64(content) instead: state rows shrink to 8 bytes + timestamp
    (the choice at 100 TB with wide documents), trading a ~|pairs|/2^64
    silent-merge probability — the same tradeoff the batch docstring
    documents, made explicit here because streaming state lives in memory.
    """
    if hash_only:
        keyed = df.withColumn(
            "_content_hash", F.xxhash64(*[F.col(c) for c in content_cols])
        )
        out = (
            keyed.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(["_content_hash"])
            .drop("_content_hash")
        )
        return out
    return df.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        content_cols
    )


def _bucket_expr(n_buckets: int):
    """The ONE bucket function both the compaction writer and the probe
    reader use: pmod keeps it non-negative for negative xxhash64 values.
    Any drift between write-side and read-side bucketing silently loses
    dup matches, so both sides call this."""
    return F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int")


def _read_compact_tree(spark, tree: str, idx_schema, probe=None):
    """Read one ``index_compact/upto=N`` tree, partition-pruned to the
    buckets the probe batch can possibly match.

    Layouts understood:
    - bucketed (current writer): ``bucket=<k>/`` subdirs + an ``_nb`` meta
      file holding the bucket count. With a probe, only the probe's own
      buckets are opened (explicit sub-paths + basePath — Spark never
      lists the other bucket dirs); without one, all buckets.
    - legacy flat tree (pre-bucketing) — read whole.
    - bucketed but ``_nb`` missing (crash between parquet commit and meta
      write): all buckets read — a correct superset, never a miss.

    Returns None when pruning proves no row can match (probe hits only
    absent buckets).
    """
    children = fsio.list_names(tree, spark)
    bucket_dirs = {n for n in children if n.startswith("bucket=")}
    if not bucket_dirs:
        return spark.read.schema(idx_schema).parquet(tree)
    sel = sorted(bucket_dirs)
    # pruning below ~8 buckets can't beat the cost of the distinct-bucket
    # job it needs — read small trees whole
    if probe is not None and len(bucket_dirs) > 8:
        nb_txt = fsio.read_text(f"{tree}/_nb", spark)
        if nb_txt:
            nb = int(nb_txt)
            hit = {
                r[0]
                for r in probe.select(_bucket_expr(nb).alias("_bk"))
                .distinct()
                .collect()
            }
            sel = [n for n in sel if int(n.split("=", 1)[1]) in hit]
            if not sel:
                return None
    schema_b = T.StructType(
        list(idx_schema) + [T.StructField("bucket", T.IntegerType())]
    )
    return (
        spark.read.schema(schema_b)
        .option("basePath", tree)
        .parquet(*[f"{tree}/{n}" for n in sel])
        .drop("bucket")
    )


def start_corpus_dedup_ingest(
    docs: DataFrame,
    corpus_path: str,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    *,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    compact_every: int | None = None,
    bucket_target_rows: int = 1_000_000,
    first_batch_id: int = 0,
    verify_collect_cap: int = 20_000,
):
    """Continuous ingest dedup against ALL accumulated history — the
    daily-crawl loop (`operators.dedup.incremental_dedup`'s exact path)
    as a streaming topology: per micro-batch, classify every incoming
    document against the corpus built by all PRIOR batches, land only
    the fresh ones, and log every classification.

    Layout under ``corpus_path``:

    - ``data/batch=<id>/``  — the fresh documents each batch landed,
      sorted by id within files so candidate-id point lookups prune
      parquet row groups via min/max stats;
    - ``index/batch=<id>/`` — their slim (id, xxhash64) rows: future
      batches join THIS (8-byte keys), never the corpus texts;
    - ``index_compact/upto=<N>/bucket=<k>/`` — the folded history index,
      HASH-BUCKETED: ``_nb`` (a meta file beside the buckets) records the
      bucket count, chosen at fold time as ceil(rows / bucket_target_rows)
      so per-bucket volume stays constant as history grows;
    - ``log/batch=<id>/``   — (id, status, match_id) per incoming doc:
      ``fresh`` | ``exact_dup`` (vs corpus, min matching id) |
      ``batch_dup`` (vs an earlier row of the same batch).

    Why buckets: a flat compact tree makes every micro-batch scan the
    ENTIRE history index — linear in corpus age. Bucketed, the probe
    opens only the buckets the incoming hashes land in: per-batch read
    volume is ~min(distinct incoming hashes, n_buckets) × bucket_target
    rows — proportional to BATCH size, flat in history decades (measured
    in SCALE.md's endurance probe). The same idea applied to the text
    verification: candidate index rows carry their landing batch, so the
    corpus-text read opens only ``data/batch=<b>`` dirs that actually
    hold a candidate (explicit paths — no full-tree partition listing,
    which was the measured per-batch drift term at 10³ batches) and
    pushes the candidate ids down as an IN filter for row-group pruning.
    Candidates are driver-bounded by ``verify_collect_cap`` (default
    20k ≈ 1 MB of (id, batch) keys): under it, ONE bounded collect runs
    the probe join once and doubles as the verify join's broadcast side;
    over it (a degenerate cross-history dup storm), the plan falls back
    to a checkpointed candidate table and join-based pruning — same
    rows, no driver list.

    Exactly-once WITHOUT marker files: every write is an overwrite of
    the batch's own partition directory (idempotent under re-delivery),
    and the classification base is ``batch < current_batch_id`` — so a
    replay whose previous attempt already landed its output classifies
    against exactly the same base and rewrites identical results, never
    against its own half-landed rows (the self-dup poisoning a naive
    append suffers).

    Collision safety mirrors the batch operator: the hash join only
    nominates candidates; texts are compared byte-for-byte for exactly
    the matched sliver.

    ``compact_every=N`` folds the slim index every N batches into
    ``index_compact/upto=<id+1>/`` (all rows with ``batch`` ≤ the
    compacting batch, ``batch`` kept as a data column) and deletes the
    folded ``index/batch=*`` dirs plus older compact trees — bounding
    the per-batch file-listing cost that otherwise grows linearly with
    batch count. Crash-safe on two mechanisms: (1) readers accept only
    compact trees whose parquet job COMMITTED (``_SUCCESS`` present) and
    take the largest committed ``upto`` — a tree a crashed compaction
    half-wrote is invisible, and because deletions run strictly after
    commit, the previous committed tree plus the per-batch dirs it would
    have folded are all still present, so the base row set is unchanged;
    (2) row-level filters (compact tree rows ``batch < upto`` of the
    per-batch read) make any leftover not-yet-deleted folded dir
    harmless. Re-running a compaction is a pure overwrite + re-delete.
    The ``data/`` tree is never compacted: texts are read only for
    matched slivers, and folding data would rewrite the whole corpus
    each cycle.

    ``first_batch_id`` bootstraps the stream ATOP an imported corpus:
    when ``corpus_path`` already holds batches [0, first_batch_id) — a
    one-time batch import of an existing lake, laid out as ``data/
    batch=*`` plus a committed ``index_compact/upto=first_batch_id``
    tree — the stream's own numbering starts above them, so every
    imported batch satisfies ``batch < current`` and classifies as prior
    history from the very first trigger.
    """
    spark = docs.sparkSession

    def process(batch_df: DataFrame, stream_batch_id: int) -> None:
        batch_id = stream_batch_id + first_batch_id
        b = batch_df.select(
            F.col(id_col), F.col(text_col),
            F.xxhash64(F.col(text_col)).alias("_h"),
        ).localCheckpoint(eager=True)  # several passes below

        # Read the history index with an EXPLICIT schema, never a bare
        # try/except around the read: schema inference would turn "no
        # index yet" (first batch) and "index dir exists but only holds
        # an uncommitted _temporary from a crashed write" into errors,
        # while a bare except would also swallow transient read failures
        # (object-store hiccup, permission blip) and classify every
        # incoming doc as fresh, landing duplicates. With the schema
        # pinned, both empty states read as zero rows and any genuine IO
        # error still fails the micro-batch so the checkpoint retries it.
        idx_schema = T.StructType(
            [
                b.schema[id_col],
                T.StructField("_h", T.LongType()),
                T.StructField("batch", T.IntegerType()),
            ]
        )
        # compacted history: the largest COMMITTED upto tree wins (the
        # _SUCCESS gate; see docstring crash-safety contract). The bare
        # largest-upto fallback only fires when NO tree carries a marker
        # — a deployment that disabled success markers globally — never
        # after a crashed fold, whose predecessor tree keeps its marker.
        compact_root = f"{corpus_path}/index_compact"
        trees = [
            n
            for n in fsio.list_names(compact_root, spark)
            if n.startswith("upto=")
        ]
        committed = [
            n for n in trees if fsio.exists(f"{compact_root}/{n}/_SUCCESS", spark)
        ]
        upto = max(
            (int(n.split("=", 1)[1]) for n in (committed or trees)),
            default=0,
        )
        parts = []
        if upto:
            cdf = _read_compact_tree(
                spark, f"{compact_root}/upto={upto}", idx_schema, probe=b
            )
            if cdf is not None:
                parts.append(cdf.filter(F.col("batch") < batch_id))
        if fsio.exists(f"{corpus_path}/index", spark):
            parts.append(
                spark.read.schema(idx_schema)
                .parquet(f"{corpus_path}/index")
                # batch >= upto: rows below upto live in the compact tree
                # (residual not-yet-deleted folded dirs must not double)
                .filter(
                    (F.col("batch") < batch_id) & (F.col("batch") >= upto)
                )
            )
        base_idx = None
        if parts:
            base_idx = parts[0] if len(parts) == 1 else parts[0].unionByName(
                parts[1]
            )

        cand = None
        if base_idx is not None:
            cand_plan = b.join(
                base_idx.select(
                    F.col(id_col).alias("_bid"),
                    "_h",
                    F.col("batch").alias("_bb"),
                ),
                "_h",
            ).select(id_col, "_bid", "_bb")
            # ONE bounded collect runs the probe join exactly once and
            # serves THREE consumers: candidate ids (IN pushdown),
            # landing batches (explicit data paths), and — when bounded —
            # the verify join's cand side itself, rebuilt as a LOCAL
            # relation (broadcast, no shuffle, no re-execution). Only the
            # over-cap dup storm pays for a checkpoint + re-collect.
            cand_keys = cand_plan.limit(verify_collect_cap + 1).collect()
            if len(cand_keys) > verify_collect_cap:
                cand = cand_plan.localCheckpoint(eager=True)
                cand_keys = cand.select("_bid", "_bb").distinct().limit(
                    verify_collect_cap + 1
                ).collect()
            elif cand_keys:
                cand = spark.createDataFrame(
                    cand_keys,
                    T.StructType(
                        [
                            b.schema[id_col],
                            T.StructField("_bid", b.schema[id_col].dataType),
                            T.StructField("_bb", T.IntegerType()),
                        ]
                    ),
                )
            cand_batches = sorted({r["_bb"] for r in cand_keys})
        if cand is not None and cand_batches:
            # Text verification reads ONLY the batch dirs holding a
            # candidate — explicit sub-paths, so Spark never lists the
            # full data/ tree (the measured per-batch drift term). An
            # index row with batch=k guarantees data/batch=k committed:
            # within an attempt data lands before index, and replays
            # overwrite both.
            capped = len(cand_keys) <= verify_collect_cap
            if capped and len(cand_batches) <= 4096:
                base_src = (
                    spark.read.option("basePath", f"{corpus_path}/data")
                    .parquet(
                        *[
                            f"{corpus_path}/data/batch={v}"
                            for v in cand_batches
                        ]
                    )
                )
            else:  # degenerate cross-history dup storm: full read is
                # cheaper than ten-thousand explicit paths
                base_src = spark.read.parquet(f"{corpus_path}/data").filter(
                    F.col("batch") < batch_id
                )
            # candidate ids as an IN filter when bounded: pushed to the
            # parquet scan, prunes row groups via min/max stats (data is
            # written id-sorted). Above the bound, a broadcast-able
            # semi-join does the same work without a driver-side list.
            if capped:
                ids = {r["_bid"] for r in cand_keys}
                pruned = base_src.filter(F.col(id_col).isin(list(ids)))
            else:
                pruned = base_src.join(
                    cand.select(F.col("_bid").alias(id_col)).distinct(),
                    id_col,
                    "left_semi",
                )
            base_txt = pruned.select(
                F.col(id_col).alias("_bid"), F.col(text_col).alias("_bt")
            )
            exact = (
                cand.join(base_txt, "_bid")
                .join(b.select(id_col, text_col), id_col)
                .filter(F.col(text_col) == F.col("_bt"))
                .groupBy(id_col)
                .agg(F.min("_bid").alias("match_id"))
            )
        else:
            exact = b.select(id_col).limit(0).withColumn(
                "match_id", F.col(id_col)
            )

        # within-batch dups: first (min id) per identical text survives.
        # ONE window shuffle (partition by text) replaces the former
        # groupBy(text) + join-back-on-text pair, and the classified rows
        # keep text + _h so every write below is a pure filter+project
        # over the pinned result — no per-write semi-join back to the
        # batch. The price is pinning the batch's texts twice (b and
        # log); both are exactly batch-sized, never history-sized.
        keep = F.min(id_col).over(Window.partitionBy(text_col))
        log = (
            b.withColumn("_keep", keep)
            .join(exact, id_col, "left")  # exact is candidate-sized: AQE
            # broadcasts it under the classification window's shuffle
            .select(
                id_col, text_col, "_h",
                F.when(F.col("match_id").isNotNull(), F.lit("exact_dup"))
                .when(F.col(id_col) != F.col("_keep"), F.lit("batch_dup"))
                .otherwise(F.lit("fresh"))
                .alias("status"),
                F.coalesce(
                    "match_id",
                    F.when(F.col(id_col) != F.col("_keep"), F.col("_keep")),
                ).alias("match_id"),
            )
        ).localCheckpoint(eager=True)  # classification pinned pre-write

        fresh = log.filter(F.col("status") == "fresh")
        # id-sorted within files → row-group min/max stats make the
        # candidate-id IN pushdown above actually skip
        fresh.select(id_col, text_col).sortWithinPartitions(id_col).write.mode(
            "overwrite"
        ).parquet(f"{corpus_path}/data/batch={batch_id}")
        # slim outputs collapse to ONE file per batch: a 10M-row index
        # partition is ~160 MB — fine as a single file — while inheriting
        # the batch's 32-way partitioning would grow the per-batch
        # listing cost of `index/` by 32× (the small-files problem is the
        # first thing that drifts in the endurance bench). repartition,
        # NOT coalesce: coalesce(1) would collapse the upstream
        # classification join itself into one task, while the repartition
        # shuffle moves only the slim output rows.
        fresh.select(id_col, "_h").repartition(1).write.mode(
            "overwrite"
        ).parquet(f"{corpus_path}/index/batch={batch_id}")
        log.select(id_col, "status", "match_id").repartition(1).write.mode(
            "overwrite"
        ).parquet(f"{corpus_path}/log/batch={batch_id}")

        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            new_upto = batch_id + 1
            folded = spark.read.schema(idx_schema).parquet(
                f"{corpus_path}/index"
            ).filter((F.col("batch") < new_upto) & (F.col("batch") >= upto))
            if upto:
                prev = _read_compact_tree(
                    spark, f"{compact_root}/upto={upto}", idx_schema
                )
                folded = prev.filter(F.col("batch") < new_upto).unionByName(
                    folded
                )
            folded = folded.localCheckpoint(eager=True)  # count + write
            rows = folded.count()
            # bucket count scales WITH history so per-bucket volume stays
            # ~bucket_target_rows — the invariant that keeps per-batch
            # probe reads proportional to batch size, not corpus age
            nb_new = max(1, -(-rows // bucket_target_rows))
            # write the new tree FIRST (readers ignore it until _SUCCESS
            # lands at job commit), then the meta, then clean up — a
            # crash at any point leaves the previous committed tree and
            # the dirs it folds intact
            (
                folded.withColumn("bucket", _bucket_expr(nb_new))
                .repartition(nb_new, "bucket")
                .write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(f"{compact_root}/upto={new_upto}")
            )
            fsio.write_text_atomic(
                f"{compact_root}/upto={new_upto}/_nb", str(nb_new), spark
            )
            for n in fsio.list_names(compact_root, spark):
                if n.startswith("upto=") and int(n.split("=", 1)[1]) < new_upto:
                    fsio.delete(f"{compact_root}/{n}", spark=spark)
            for n in fsio.list_names(f"{corpus_path}/index", spark):
                if n.startswith("batch=") and int(n.split("=", 1)[1]) < new_upto:
                    fsio.delete(f"{corpus_path}/index/{n}", spark=spark)

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
