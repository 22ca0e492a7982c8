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

from pyspark.sql import DataFrame, functions as F, types as T


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
):
    """Continuous ingest dedup against ALL accumulated history — the
    daily-crawl loop (`operators.dedup.incremental_dedup`'s exact path)
    as a streaming topology: per micro-batch, classify every incoming
    document against the corpus built by all PRIOR batches, land only
    the fresh ones, and log every classification.

    Layout under ``corpus_path`` (all reads/writes partition-pruned on
    the ``batch`` column):

    - ``data/batch=<id>/``  — the fresh documents each batch landed;
    - ``index/batch=<id>/`` — their slim (id, xxhash64) rows: future
      batches join THIS (8-byte keys), never the corpus texts;
    - ``log/batch=<id>/``   — (id, status, match_id) per incoming doc:
      ``fresh`` | ``exact_dup`` (vs corpus, min matching id) |
      ``batch_dup`` (vs an earlier row of the same batch).

    Exactly-once WITHOUT marker files: every write is an overwrite of
    the batch's own partition directory (idempotent under re-delivery),
    and the classification base is ``batch < current_batch_id`` — so a
    replay whose previous attempt already landed its output classifies
    against exactly the same base and rewrites identical results, never
    against its own half-landed rows (the self-dup poisoning a naive
    append suffers).

    Collision safety mirrors the batch operator: the hash join only
    nominates candidates; texts are compared byte-for-byte for exactly
    the matched sliver (one semi-joined pruned scan of the corpus).

    ``compact_every=N`` folds the slim index every N batches into
    ``index_compact/upto=<id+1>/`` (all rows with ``batch`` ≤ the
    compacting batch, ``batch`` kept as a data column) and deletes the
    folded ``index/batch=*`` dirs plus older compact trees — bounding
    the per-batch file-listing cost that otherwise grows linearly with
    batch count (the 10⁴-batch term SCALE.md's endurance run measured).
    Crash-safe by the same row-set argument as the batch writes: readers
    always take the LARGEST ``upto`` tree and row-filter ``batch <
    current``, and the per-batch tree is read only for ``batch ≥ upto``
    — so any interleaving of a crashed compaction (new tree written,
    old dirs not yet deleted, or vice versa) filters to the identical
    base row set, and re-running the compaction is a pure overwrite +
    re-delete. The ``data/`` tree is never compacted: texts are read
    only for matched slivers, and folding data would rewrite the whole
    corpus each cycle.
    """
    spark = docs.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
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
        from ..sources import fsio

        idx_schema = T.StructType(
            [
                b.schema[id_col],
                T.StructField("_h", T.LongType()),
                T.StructField("batch", T.IntegerType()),
            ]
        )
        # compacted history: the LARGEST upto tree wins (row-level batch
        # filters below make any crash interleaving read the same base)
        upto = max(
            (
                int(n.split("=", 1)[1])
                for n in fsio.list_names(f"{corpus_path}/index_compact", spark)
                if n.startswith("upto=")
            ),
            default=0,
        )
        parts = []
        if upto:
            parts.append(
                spark.read.schema(idx_schema)
                .parquet(f"{corpus_path}/index_compact/upto={upto}")
                .filter(F.col("batch") < batch_id)
            )
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
            if base_idx.isEmpty():  # first batch / crashed-write leftover
                base_idx = None

        if base_idx is not None:
            cand = (
                b.join(
                    base_idx.select(F.col(id_col).alias("_bid"), "_h"), "_h"
                )
                .select(id_col, "_bid")
            )
            base_txt = (
                spark.read.parquet(f"{corpus_path}/data")
                .filter(F.col("batch") < batch_id)
                .join(
                    cand.select(F.col("_bid").alias(id_col)).distinct(),
                    id_col, "left_semi",
                )
                .select(F.col(id_col).alias("_bid"), F.col(text_col).alias("_bt"))
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

        # within-batch dups: first (min id) per identical text survives
        w_min = b.groupBy(text_col).agg(F.min(id_col).alias("_keep"))
        batch_dup = (
            b.join(w_min, text_col)
            .filter(F.col(id_col) != F.col("_keep"))
            .select(id_col, F.col("_keep").alias("batch_match"))
        )

        log = (
            b.select(id_col)
            .join(exact, id_col, "left")
            .join(batch_dup, id_col, "left")
            .select(
                id_col,
                F.when(F.col("match_id").isNotNull(), F.lit("exact_dup"))
                .when(F.col("batch_match").isNotNull(), F.lit("batch_dup"))
                .otherwise(F.lit("fresh"))
                .alias("status"),
                F.coalesce("match_id", "batch_match").alias("match_id"),
            )
        ).localCheckpoint(eager=True)  # classification pinned pre-write

        fresh = b.join(
            log.filter(F.col("status") == "fresh"), id_col, "left_semi"
        )
        fresh.select(id_col, text_col).write.mode("overwrite").parquet(
            f"{corpus_path}/data/batch={batch_id}"
        )
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
        log.repartition(1).write.mode("overwrite").parquet(
            f"{corpus_path}/log/batch={batch_id}"
        )

        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            new_upto = batch_id + 1
            folded = spark.read.schema(idx_schema).parquet(
                f"{corpus_path}/index"
            ).filter((F.col("batch") < new_upto) & (F.col("batch") >= upto))
            if upto:
                folded = spark.read.schema(idx_schema).parquet(
                    f"{corpus_path}/index_compact/upto={upto}"
                ).filter(F.col("batch") < new_upto).unionByName(folded)
            # write the new tree FIRST (overwrite-idempotent), then clean
            # up — a crash at any point leaves a readable superset the
            # row filters reduce to the same base
            folded.repartition(1).write.mode("overwrite").parquet(
                f"{corpus_path}/index_compact/upto={new_upto}"
            )
            for n in fsio.list_names(f"{corpus_path}/index_compact", spark):
                if n.startswith("upto=") and int(n.split("=", 1)[1]) < new_upto:
                    fsio.delete(f"{corpus_path}/index_compact/{n}", spark=spark)
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
