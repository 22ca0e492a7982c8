"""Streaming ANN index maintenance: keep a persisted IVF, LSH, PQ or
IVF-PQ index current from a vector stream.

    vector stream ──foreachBatch──► append_to_{ivf,lsh,pq}_index
                                     └─ every N batches: compact_*_index

The daily-crawl loop (streaming/dedup.py's topology shape) applied to
similarity indexes: each micro-batch is one map-only assign/bucketize over
the INCREMENT (O(batch), never the O(corpus) rebuild the index would
otherwise need as the corpus grows), appended into the index's partitioned
layout; periodic compaction folds the per-append files back to the
one-file-per-directory contract.

EXACTLY-ONCE ACROSS RESTART: ``foreachBatch`` is at-least-once — a crash
between the append and the checkpoint commit replays the batch. A
batch-scoped overwrite (streaming/ingest.py's cure) does not fit here: the
append targets list/bucket partitions shared with ALL history, and adding
a batch partition level would change the index layout every query reads.
Instead the sink runs a marker + replay-dedupe protocol:

- FIRST attempt at batch N: atomically stamp ``{index}/_ingest_marker``
  with N, then plain-append (fast path — no corpus scan).
- REPLAY of batch N (entry marker already == N — the stamp survived the
  crash): append with ``dedupe=True``, which anti-joins the batch against
  ids already in the index (an id-column-pruned scan), so rows the crashed
  attempt landed — wholly or partially — are skipped and the rest land
  exactly once.

The marker is stamped BEFORE the append on purpose: stamping after would
make "crashed between append and stamp" indistinguishable from a first
attempt and double-land the batch; stamping before means the worst case is
one unnecessary dedupe pass. The dedupe cost is paid ONLY on the crash
path, never per batch.

Two more protocol pieces (r13): every ingest dispatches the
kind-appropriate ``repair_*_index`` BEFORE touching the tree, so a
compaction swap torn by a crash heals on the next batch instead of
fail-stopping or silently truncating the index; and the sink holds a
single-writer ``_ingest_owner`` lease keyed on its checkpoint dir, since
two concurrent topologies would interleave marker stamps and corrupt
each other's replay detection (see :func:`start_ann_index_ingest`).

CONTRACT (same as ``append_to_ivf_index``'s default): batch ids are new to
the index. A source that re-sends known ids (re-crawled documents) should
pass ``dedupe=True`` to anti-join EVERY batch — correctness over the fast
path — or dedupe upstream (streaming/dedup.py exists for exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators import similarity as SIM
from ..sources import fsio

MARKER = "_ingest_marker"
OWNER = "_ingest_owner"


def _read_marker(spark: SparkSession, index_path: str) -> int | None:
    txt = fsio.read_text(f"{index_path}/{MARKER}", spark=spark)
    return int(txt.strip()) if txt else None


def ingest_batch_into_index(
    spark: SparkSession,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    *,
    kind: str,
    corpus_id: str,
    vec_col: str,
    dedupe: bool | str = "auto",
) -> int:
    """Land ONE micro-batch into the persisted index with the marker +
    replay-dedupe protocol (module docstring). Exposed as a plain
    function so the replay path is directly testable; the foreachBatch
    sink is a thin wrapper. Returns rows appended (0 on a full replay).

    ``dedupe``: ``'auto'`` anti-joins only when the entry marker says
    this batch already started once (the crash-replay path); ``True``
    always anti-joins; ``False`` never does (trusted exactly-once
    upstream).

    TORN-COMPACTION REPAIR RUNS FIRST: a ``compact_every`` crash between
    the swap's two renames leaves the live tree missing with the
    committed replacement parked at ``__compacting``. Appending into
    that state would either fail-stop every restart (the dedupe path's
    read of the missing live tree throws) or — worse, with
    ``dedupe=False`` — silently recreate the live tree containing ONLY
    the replayed batch, after which the next compaction discards the
    parked full history. So every ingest dispatches the kind-appropriate
    ``repair_*_index`` before touching the tree (one exists-check per
    call on the intact path), exactly as ``compact_*_index`` itself
    does."""
    {
        "ivf": SIM.repair_ivf_index,
        "lsh": SIM.repair_lsh_index,
        "pq": SIM.repair_pq_index,
        "ivfpq": SIM.repair_ivfpq_index,
        "sharded_ivf": SIM.repair_sharded_ivf_index,
        "sharded_ivfpq": SIM.repair_sharded_ivfpq_index,
    }[kind](spark, index_path)
    if dedupe == "auto":
        do_dedupe = _read_marker(spark, index_path) == batch_id
    elif isinstance(dedupe, bool):
        do_dedupe = dedupe
    else:
        raise ValueError(f"dedupe must be 'auto', True or False, got {dedupe!r}")
    fsio.write_text_atomic(
        f"{index_path}/{MARKER}", str(batch_id), spark=spark
    )
    append = {
        "ivf": SIM.append_to_ivf_index,
        "lsh": SIM.append_to_lsh_index,
        "pq": SIM.append_to_pq_index,
        "ivfpq": SIM.append_to_ivfpq_index,
        "sharded_ivf": SIM.append_to_sharded_ivf_index,
        "sharded_ivfpq": SIM.append_to_sharded_ivfpq_index,
    }[kind]
    return append(
        spark, index_path, batch_df,
        corpus_id=corpus_id, vec_col=vec_col, dedupe=do_dedupe,
    )


def start_ann_index_ingest(
    vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    *,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    dedupe: bool | str = "auto",
    compact_every: int | str | None = None,
    compact_files_threshold: int = 8,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    takeover: bool = False,
    on_rebuild_due=None,
    plan_thresholds: dict | None = None,
) -> StreamingQuery:
    """Start the streaming maintenance sink for the persisted ANN index
    at ``index_path`` (kind — IVF, LSH, PQ, IVF-PQ or sharded IVF — is
    read from the index's own manifest, so a topology can't append with
    the wrong family's parameters). ``compact_every=N`` folds the per-append files back to
    one per directory after every N batches (compaction runs inside the
    same foreachBatch slot — replays of a compacted batch are safe: the
    swap is committed-tree-first, and every ingest runs the
    kind-appropriate ``repair_*_index`` BEFORE its append, so a swap
    torn by a crash is finished on the very next batch — see
    :func:`ingest_batch_into_index` — never appended around).

    ``compact_every='auto'`` compacts ON THE POLICY instead of a fixed
    cadence: after each batch the sink reads the files-per-directory
    LAYOUT gauge (``index_layout_stats`` — pure metadata listing,
    bounded by the 4096-list clamp; per-shard for a sharded tree) and
    compacts when it exceeds ``compact_files_threshold`` — the
    ``compact_due`` rule of :func:`~..operators.similarity.
    index_maintenance_plan` applied live, so quiet streams never pay
    needless tree rewrites and bursty ones compact as soon as probe-seek
    multiplication actually warrants it. Only the layout rule EXECUTES
    here: the policy's ``rebuild_due`` (occupancy-skew) branch needs a
    full-corpus rebuild no sink should launch unattended — run
    ``apply_maintenance_plan`` offline for that.

    ``on_rebuild_due`` SURFACES the rebuild signal instead of letting
    the stream append into a silently degrading index: when set, each
    batch additionally runs the occupancy gauge + policy (one
    column-pruned groupBy over the index's key column per batch — an
    O(index-keys) job, which is why it is OPT-IN and not free like the
    layout listing; IVF/IVF-PQ/LSH/sharded kinds — PQ has no occupancy
    gauge) and, for every batch whose verdict says ``rebuild_due``,
    calls ``on_rebuild_due(report_rows)`` with the plan rows (list of
    Row). ``plan_thresholds`` overrides the policy's keyword thresholds
    (e.g. ``{'skew_threshold': 3.0, 'min_rows_for_rebuild': 1_000}``). Pass ``'raise'`` to fail the batch instead (the stream stops
    with the report in the error — the operator's choice that a
    degrading index is worse than a stopped stream). The callback
    fires once per FIRED BATCH — a drifted index keeps firing each
    batch until rebuilt, which is the honest signal shape.

    SINGLE WRITER: the marker + replay-dedupe protocol assumes exactly
    one topology per index — two concurrent writers would interleave
    ``_ingest_marker`` stamps and silently corrupt each other's replay
    detection (a replayed batch whose marker was overwritten takes the
    fast path and double-lands). The sink therefore stamps an
    ``_ingest_owner`` lease with its OWN ``checkpoint_dir`` string at
    start and refuses to start while the lease names a different
    checkpoint. Restarting the same topology (same checkpoint) always
    works — that is the identity the protocol is keyed on. Retiring a
    topology and adopting the index into a new one is an explicit
    ``takeover=True`` — the caller's assertion that the old topology is
    STOPPED, not a way to run two at once."""
    spark = vectors.sparkSession
    meta = fsio.read_json_dir(f"{index_path}/meta", spark=spark)
    if meta is None or meta["format"] not in (
        "ivf", "lsh", "pq", "ivfpq", "sharded_ivf", "sharded_ivfpq"
    ):
        raise ValueError(
            f"start_ann_index_ingest: {index_path}/meta is not an "
            "IVF/LSH/PQ/IVF-PQ/sharded-IVF index manifest"
        )
    kind = meta["format"]
    if compact_every is not None and compact_every != "auto" and (
        not isinstance(compact_every, int) or compact_every < 1
    ):
        raise ValueError(
            f"compact_every must be a positive int, 'auto' or None, "
            f"got {compact_every!r}"
        )
    # Lease acquisition is an EXCLUSIVE CREATE, not check-then-write: two
    # topologies racing an absent lease would both pass a read-then-stamp
    # check; with O_CREAT|O_EXCL / create(overwrite=false) exactly one
    # wins and the loser reads the winner's checkpoint and refuses. The
    # compare path below is only reached when the lease file already
    # exists — a same-checkpoint restart (allowed: that IS the identity
    # the replay protocol is keyed on) or an explicit takeover.
    lease = f"{index_path}/{OWNER}"
    if not fsio.create_text_exclusive(lease, checkpoint_dir, spark=spark):
        owner = fsio.read_text(lease, spark=spark)
        held_by = owner.strip() if owner else ""
        if held_by != checkpoint_dir and not takeover:
            raise ValueError(
                f"start_ann_index_ingest: {index_path} is owned by the "
                f"topology checkpointed at {held_by!r}; this one uses "
                f"{checkpoint_dir!r}. Concurrent writers would corrupt the "
                "replay-marker protocol — stop the owning topology and pass "
                "takeover=True to adopt the index."
            )
        if held_by != checkpoint_dir:
            fsio.write_text_atomic(lease, checkpoint_dir, spark=spark)
    compact = {
        "ivf": SIM.compact_ivf_index,
        "lsh": SIM.compact_lsh_index,
        "pq": SIM.compact_pq_index,
        "ivfpq": SIM.compact_ivfpq_index,
        "sharded_ivf": SIM.compact_sharded_ivf_index,
        "sharded_ivfpq": SIM.compact_sharded_ivfpq_index,
    }[kind]

    def max_files_per_dir() -> int:
        if kind in ("sharded_ivf", "sharded_ivfpq"):
            n_sh = int(
                fsio.read_json_dir(f"{index_path}/meta", spark=spark)["n_shards"]
            )
            tree = "assignments" if kind == "sharded_ivf" else "entries"
            return max(
                SIM.index_layout_stats(
                    spark, f"{index_path}/shard={s:05d}", tree
                )["max_files_per_dir"]
                for s in range(n_sh)
            )
        tree = {
            "ivf": "assignments", "lsh": "buckets", "pq": "codes",
            "ivfpq": "entries",
        }[kind]
        return SIM.index_layout_stats(spark, index_path, tree)["max_files_per_dir"]

    if on_rebuild_due is not None and kind == "pq":
        raise ValueError(
            "start_ann_index_ingest: on_rebuild_due needs an occupancy "
            "gauge, which PQ trees do not have (ADC reads every code row "
            "by design)"
        )

    def occupancy_fired():
        if kind == "sharded_ivf":
            stats = SIM.sharded_ivf_index_stats(
                SIM.load_sharded_ivf_index(spark, index_path)
            )
        elif kind == "sharded_ivfpq":
            stats = SIM.sharded_ivfpq_index_stats(
                SIM.load_sharded_ivfpq_index(spark, index_path)[0]
            )
        elif kind == "lsh":
            stats = SIM.lsh_index_stats(
                spark.read.parquet(f"{index_path}/buckets")
            )
        else:  # ivf / ivfpq
            tree = {"ivf": "assignments", "ivfpq": "entries"}[kind]
            stats = SIM.ivf_index_stats(
                spark.read.parquet(f"{index_path}/{tree}")
            )
        rows = SIM.index_maintenance_plan(
            stats, **(plan_thresholds or {})
        ).collect()
        return [r for r in rows if r["action"] == "rebuild_due"]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch_into_index(
            spark, index_path, batch_df, batch_id,
            kind=kind, corpus_id=corpus_id, vec_col=vec_col, dedupe=dedupe,
        )
        if compact_every == "auto":
            if max_files_per_dir() > compact_files_threshold:
                compact(spark, index_path)
        elif compact_every and (batch_id + 1) % compact_every == 0:
            compact(spark, index_path)
        if on_rebuild_due is not None:
            fired = occupancy_fired()
            if fired:
                if on_rebuild_due == "raise":
                    raise RuntimeError(
                        f"ANN index at {index_path} is rebuild_due after "
                        f"batch {batch_id}: {[tuple(r) for r in fired]} — "
                        "run apply_maintenance_plan"
                    )
                on_rebuild_due(fired)

    writer = (
        vectors.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
