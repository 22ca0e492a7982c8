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

        if fsio.exists(f"{corpus_path}/index", spark):
            idx_schema = T.StructType(
                [
                    b.schema[id_col],
                    T.StructField("_h", T.LongType()),
                    T.StructField("batch", T.IntegerType()),
                ]
            )
            base_idx = (
                spark.read.schema(idx_schema)
                .parquet(f"{corpus_path}/index")
                .filter(F.col("batch") < batch_id)
            )
            if base_idx.isEmpty():  # crashed-first-write leftover only
                base_idx = None
        else:  # first batch ever: no index yet
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
