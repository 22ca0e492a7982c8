"""Streaming ANN index maintenance (streaming/ann_ingest.py): a persisted
IVF/LSH index kept current from a vector stream — append parity with the
batch path, marker + replay-dedupe exactly-once, periodic compaction."""

import json
import os

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
    build_ivf_index,
    bucketize_tables,
    ivf_ann_topk,
    load_ivf_index,
    load_lsh_index,
    lsh_ann_topk,
    persist_ivf_index,
    persist_lsh_index,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.ann_ingest import (
    MARKER,
    ingest_batch_into_index,
    start_ann_index_ingest,
)

VEC_SCHEMA = "vec_id long, embedding array<double>"


def _base_corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))


def _mk_ivf_tree(spark, sf_dir, tmp_path):
    base = _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 0)
    root = str(tmp_path / "ivf_stream_idx")
    persist_ivf_index(build_ivf_index(base, n_lists=8), root, mode="overwrite")
    return root, base


def _write_batch_file(src_dir, rows, name):
    with open(os.path.join(src_dir, name), "w") as fh:
        for vid, vec in rows:
            fh.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")


def test_stream_ingest_end_to_end_ivf(spark, sf_dir, tmp_path):
    """File-source vector stream → persisted IVF index: every streamed
    vector lands exactly once with the assignment the batch append gives
    it, a planted twin is findable afterward, and compact_every folds the
    per-batch files."""
    root, base = _mk_ivf_tree(spark, sf_dir, tmp_path)
    batch = (
        _base_corpus(spark, sf_dir)
        .filter(F.col("vec_id") % 2 == 1)
        .limit(40)
        .collect()
    )
    twins_src = base.filter(F.col("vec_id") < 4).collect()
    src = tmp_path / "vin"
    src.mkdir()
    _write_batch_file(
        str(src), [(r["vec_id"], list(r["embedding"])) for r in batch], "b0.json"
    )
    _write_batch_file(
        str(src),
        [(r["vec_id"] + 1_000_000, list(r["embedding"])) for r in twins_src],
        "b1.json",
    )
    stream = spark.readStream.schema(VEC_SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    q = start_ann_index_ingest(
        stream, root, str(tmp_path / "ckpt"),
        compact_every=1, available_now=True,
    )
    q.awaitTermination(180)
    assert not q.isActive

    centroids, asg = load_ivf_index(spark, root)
    n_expected = base.count() + len(batch) + len(twins_src)
    assert asg.count() == n_expected
    # compaction ran after the final batch: one file per list dir
    for d, _, files in os.walk(os.path.join(root, "assignments")):
        assert sum(1 for f in files if f.endswith(".parquet")) <= 1, d

    q_twin = base.filter(F.col("vec_id") < 4)
    hits = ivf_ann_topk(
        q_twin, q_twin, k=1, n_probe=8,
        index=(centroids, asg), scorer="hof",
    ).collect()
    assert len(hits) == len(twins_src)
    for r in hits:
        assert r["neighbor_id"] == r["query_id"] + 1_000_000
        assert r["cosine"] > 0.999999


def test_replay_protocol_ivf(spark, sf_dir, tmp_path):
    """The marker + replay-dedupe protocol: a first attempt takes the
    fast path; a REPLAY of the same batch id (entry marker already
    stamped — including after a partial landing) appends only what is
    missing; a fresh batch id takes the fast path again."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        append_to_ivf_index,
    )

    root, base = _mk_ivf_tree(spark, sf_dir, tmp_path)
    n_base = base.count()
    batch = (
        _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 1).limit(30)
    )
    kw = dict(kind="ivf", corpus_id="vec_id", vec_col="embedding")

    # first attempt: fast path, everything lands, marker stamped
    assert ingest_batch_into_index(spark, root, batch, 0, **kw) == 30
    assert open(f"{root}/{MARKER}").read() == "0"
    # full replay of batch 0: entry marker == 0 → dedupe path → 0 rows
    assert ingest_batch_into_index(spark, root, batch, 0, **kw) == 0
    assert load_ivf_index(spark, root)[1].count() == n_base + 30

    # partial-landing crash: half of batch 1 landed by the crashed
    # attempt (simulated with a plain append) and the marker survived
    batch1 = (
        _base_corpus(spark, sf_dir)
        .filter((F.col("vec_id") % 2 == 1) & F.col("vec_id").between(101, 199))
        .limit(20)
    )
    half = batch1.limit(10)
    from aws_dataset_ingestion_metrics_collection_framework_spark.sources import fsio

    fsio.write_text_atomic(f"{root}/{MARKER}", "1", spark=spark)
    append_to_ivf_index(spark, root, half)
    # the replay lands ONLY the missing half
    assert ingest_batch_into_index(spark, root, batch1, 1, **kw) == 10
    asg = load_ivf_index(spark, root)[1]
    assert asg.count() == n_base + 30 + 20
    assert (
        asg.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0
    )

    # next batch id: fast path again (marker is 1, batch id 2)
    batch2 = (
        _base_corpus(spark, sf_dir)
        .filter((F.col("vec_id") % 2 == 1) & F.col("vec_id").between(201, 299))
        .limit(5)
    )
    assert ingest_batch_into_index(spark, root, batch2, 2, **kw) == 5
    assert open(f"{root}/{MARKER}").read() == "2"


def test_stream_ingest_lsh_kind_from_manifest(spark, sf_dir, tmp_path):
    """The sink reads the index KIND from the manifest: pointing the same
    topology at an LSH tree appends bucketized rows with the stored
    params, and the twin stays findable through the query path."""
    base = _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 0)
    root = str(tmp_path / "lsh_stream_idx")
    bucketed = bucketize_tables(
        base, id_col="vec_id", id_name="neighbor_id",
        vec_col="embedding", keep_vec="cv", n_tables=4, n_planes=4,
    )
    persist_lsh_index(bucketed, root, n_planes=4, n_tables=4, seed=7, mode="overwrite")

    twins_src = base.filter(F.col("vec_id") < 4).collect()
    src = tmp_path / "vin_lsh"
    src.mkdir()
    _write_batch_file(
        str(src),
        [(r["vec_id"] + 1_000_000, list(r["embedding"])) for r in twins_src],
        "b0.json",
    )
    stream = spark.readStream.schema(VEC_SCHEMA).json(str(src))
    q = start_ann_index_ingest(
        stream, root, str(tmp_path / "ckpt_lsh"), available_now=True
    )
    q.awaitTermination(180)
    assert not q.isActive

    idx, params = load_lsh_index(spark, root)
    assert idx.count() == (base.count() + len(twins_src)) * 4
    q_twin = base.filter(F.col("vec_id") < 4)
    hits = lsh_ann_topk(
        q_twin, q_twin, k=1, index=idx, scorer="hof", **params
    ).collect()
    assert len(hits) == len(twins_src)
    for r in hits:
        assert r["neighbor_id"] == r["query_id"] + 1_000_000
        assert r["cosine"] > 0.999999


def test_ingest_rejects_non_index_path(spark, sf_dir, tmp_path):
    (tmp_path / "nowhere").mkdir()
    stream = spark.readStream.schema(VEC_SCHEMA).json(str(tmp_path / "nowhere"))
    with pytest.raises(Exception):
        start_ann_index_ingest(stream, str(tmp_path / "not_an_index"), str(tmp_path / "c"))


def test_ingest_batch_dedupe_flag_validation(spark, sf_dir, tmp_path):
    root, _ = _mk_ivf_tree(spark, sf_dir, tmp_path)
    batch = _base_corpus(spark, sf_dir).limit(1)
    with pytest.raises(ValueError, match="dedupe"):
        ingest_batch_into_index(
            spark, root, batch, 0,
            kind="ivf", corpus_id="vec_id", vec_col="embedding", dedupe="yes",
        )


def test_stream_ingest_pq_kind_from_manifest(spark, sf_dir, tmp_path):
    """PQ dispatch: the same topology pointed at a PQ tree encodes the
    stream against the frozen codebook and the appended codes match the
    batch append's exactly."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        load_pq_index,
        persist_pq_index,
        pq_index,
    )

    base = _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 0)
    root = str(tmp_path / "pq_stream_idx")
    persist_pq_index(pq_index(base, m=4), root, m=4, mode="overwrite")

    new_rows = (
        _base_corpus(spark, sf_dir)
        .filter(F.col("vec_id") % 2 == 1)
        .limit(12)
        .collect()
    )
    src = tmp_path / "vin_pq"
    src.mkdir()
    _write_batch_file(
        str(src), [(r["vec_id"], list(r["embedding"])) for r in new_rows], "b0.json"
    )
    stream = spark.readStream.schema(VEC_SCHEMA).json(str(src))
    q = start_ann_index_ingest(
        stream, root, str(tmp_path / "ckpt_pq"), available_now=True
    )
    q.awaitTermination(180)
    assert not q.isActive
    (_, codes), _ = load_pq_index(spark, root)
    assert codes.count() == (base.count() + len(new_rows)) * 4
    streamed_ids = {r["vec_id"] for r in new_rows}
    got_ids = {
        r["vec_id"] for r in codes.filter(F.col("vec_id") % 2 == 1).collect()
    }
    assert got_ids == streamed_ids


def test_stream_ingest_ivfpq_kind_from_manifest(spark, sf_dir, tmp_path):
    """IVF-PQ dispatch: the topology pointed at an ivfpq tree assigns the
    stream against the frozen IVF centroids AND encodes against the
    frozen codebook — appended rows carry both list_id and codes, and a
    replayed batch (marker protocol) lands 0."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        build_ivfpq_index,
        load_ivfpq_index,
        persist_ivfpq_index,
    )

    base = _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 0)
    root = str(tmp_path / "ivfpq_stream_idx")
    persist_ivfpq_index(
        build_ivfpq_index(base, n_lists=8, m=4, pq_k=16),
        root, m=4, pq_k=16, mode="overwrite",
    )
    new_rows = (
        _base_corpus(spark, sf_dir)
        .filter(F.col("vec_id") % 2 == 1)
        .limit(12)
        .collect()
    )
    src = tmp_path / "vin_ivfpq"
    src.mkdir()
    _write_batch_file(
        str(src), [(r["vec_id"], list(r["embedding"])) for r in new_rows], "b0.json"
    )
    stream = spark.readStream.schema(VEC_SCHEMA).json(str(src))
    q = start_ann_index_ingest(
        stream, root, str(tmp_path / "ckpt_ivfpq"), available_now=True
    )
    q.awaitTermination(180)
    assert not q.isActive
    (_, _, entries), _ = load_ivfpq_index(spark, root)
    streamed = entries.filter(F.col("vec_id") % 2 == 1)
    assert {r["vec_id"] for r in streamed.collect()} == {
        r["vec_id"] for r in new_rows
    }
    assert streamed.filter(
        F.col("list_id").isNull() | F.col("codes").isNull()
    ).count() == 0
    # replay: entry marker says this batch already started — dedupe lands 0
    n = ingest_batch_into_index(
        spark, root,
        spark.createDataFrame(
            [(r["vec_id"], list(r["embedding"])) for r in new_rows], VEC_SCHEMA
        ),
        0, kind="ivfpq", corpus_id="vec_id", vec_col="embedding",
    )
    assert n == 0
    assert entries.count() == base.count() + len(new_rows)


def test_maintenance_protocol_reference_model(spark, sf_dir, tmp_path):
    """Randomized reference-model differential for the index-maintenance
    protocol (the streaming-dedup discipline applied to the r12 surface):
    a deterministic random walk of {append, replay-crash-then-reingest,
    compact, torn-compact-then-repair} ops runs against a persisted IVF
    index, with a driver-side dict as the reference model. After every
    op the persisted assignments must equal the model EXACTLY as an
    (id → list_id) mapping, and no id may ever appear twice."""
    import random

    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        _assign_to_lists,
        append_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        load_ivf_index,
        persist_ivf_index,
        repair_ivf_index,
    )
    from aws_dataset_ingestion_metrics_collection_framework_spark.sources import fsio

    emb = _base_corpus(spark, sf_dir)
    all_rows = emb.collect()
    base_rows, pool = all_rows[:100], all_rows[100:]
    base = spark.createDataFrame(base_rows, emb.schema)
    root = str(tmp_path / "proto_idx")
    persist_ivf_index(build_ivf_index(base, n_lists=6), root, mode="overwrite")
    centroids = load_ivf_index(spark, root)[0]

    def assigned_map(rows):
        df = spark.createDataFrame(rows, emb.schema).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        return {
            r["cid"]: r["list_id"]
            for r in _assign_to_lists(df, centroids).collect()
        }

    model = assigned_map(base_rows)
    rng = random.Random(7)
    cursor = 0
    batch_id = 0
    kw = dict(kind="ivf", corpus_id="vec_id", vec_col="embedding")
    for step in range(8):
        op = rng.choice(["append", "replay", "compact", "torn"])
        if op in ("append", "replay") and cursor < len(pool):
            take = rng.randint(5, 25)
            rows = pool[cursor : cursor + take]
            cursor += take
            batch = spark.createDataFrame(rows, emb.schema)
            if op == "replay":
                # crashed first attempt: marker stamped, PART landed
                fsio.write_text_atomic(f"{root}/{MARKER}", str(batch_id), spark=spark)
                part = spark.createDataFrame(rows[: take // 2], emb.schema)
                append_to_ivf_index(spark, root, part)
            n = ingest_batch_into_index(spark, root, batch, batch_id, **kw)
            assert n == (take - take // 2 if op == "replay" else take), (step, op)
            model.update(assigned_map(rows))
            batch_id += 1
        elif op == "compact":
            compact_ivf_index(spark, root)
        else:  # torn compact swap, then repair
            meta = spark.read.json(f"{root}/meta").first()
            fsio.delete(f"{root}/assignments__compacting", spark=spark)
            (
                spark.read.parquet(f"{root}/assignments")
                .repartition(int(meta["n_lists"]), "list_id")
                .write.partitionBy("list_id").mode("error")
                .parquet(f"{root}/assignments__compacting")
            )
            fsio.rename(
                f"{root}/assignments", f"{root}/assignments__old", spark=spark
            )
            assert repair_ivf_index(spark, root) is True
        got_rows = load_ivf_index(spark, root)[1].collect()
        got_ids = [r["vec_id"] for r in got_rows]
        assert len(got_ids) == len(set(got_ids)), f"dup ids after {op} @ {step}"
        got = {r["vec_id"]: r["list_id"] for r in got_rows}
        assert got == model, f"model divergence after {op} @ {step}"


def test_stream_ingest_sharded_kind_from_manifest(spark, sf_dir, tmp_path):
    """Sharded-IVF dispatch: the topology pointed at a sharded tree
    routes each streamed vector to its hash shard and the disjoint-cover
    invariant holds afterward."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        build_sharded_ivf_index,
        load_sharded_ivf_index,
        persist_sharded_ivf_index,
    )

    base = _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 0)
    root = str(tmp_path / "sivf_stream_idx")
    persist_sharded_ivf_index(
        build_sharded_ivf_index(base, n_shards=2, n_lists=6),
        root, mode="overwrite",
    )
    new_rows = (
        _base_corpus(spark, sf_dir)
        .filter(F.col("vec_id") % 2 == 1)
        .limit(15)
        .collect()
    )
    src = tmp_path / "vin_sivf"
    src.mkdir()
    _write_batch_file(
        str(src), [(r["vec_id"], list(r["embedding"])) for r in new_rows], "b0.json"
    )
    stream = spark.readStream.schema(VEC_SCHEMA).json(str(src))
    q = start_ann_index_ingest(
        stream, root, str(tmp_path / "ckpt_sivf"), available_now=True
    )
    q.awaitTermination(180)
    assert not q.isActive
    loaded = load_sharded_ivf_index(spark, root)
    assert sum(a.count() for _, a in loaded) == base.count() + len(new_rows)
    for s, (_, asg) in enumerate(loaded):
        assert asg.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(2)) != s
        ).count() == 0, s


_ANN_CHAOS_CHILD = '''
import os, signal, sys
sys.path.insert(0, {repo!r})
bomb_arm, src, index_path, ckpt, compact_every = sys.argv[1:6]
from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming import ann_ingest
from aws_dataset_ingestion_metrics_collection_framework_spark.sources import fsio

if bomb_arm == "kill_after_marker_b1":
    orig = fsio.write_text_atomic
    def bomb(path, text, spark=None):
        orig(path, text, spark)
        # marker for batch 1 is STAMPED (survives the kill), append has
        # not run: the exact window the replay-dedupe protocol covers
        if path.endswith(ann_ingest.MARKER) and text == "1":
            os.kill(os.getpid(), signal.SIGKILL)
    fsio.write_text_atomic = bomb  # ann_ingest resolves fsio.<attr> at call time
elif bomb_arm == "kill_mid_swap_shard0":
    orig_rn = fsio.rename
    def bombr(src_p, dst_p, spark=None):
        orig_rn(src_p, dst_p, spark)
        # the compaction swap's FIRST rename (live -> __old) of shard 0
        # just happened: live tree missing, committed __compacting parked
        # - the exact torn-swap window repair_*_index covers, torn by a
        # REAL SIGKILL inside the streaming foreachBatch slot
        if dst_p.endswith("assignments__old") and "shard=00000" in dst_p:
            os.kill(os.getpid(), signal.SIGKILL)
    fsio.rename = bombr  # similarity._commit_swap resolves fsio.<attr> at call time

spark = get_spark(app_name="ann-chaos-child", master="local[4]",
                  shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
stream = (spark.readStream.schema("vec_id long, embedding array<double>")
          .option("maxFilesPerTrigger", 1).json(src))
q = ann_ingest.start_ann_index_ingest(stream, index_path, ckpt,
                                      compact_every=int(compact_every) or None,
                                      available_now=True)
q.awaitTermination(300)
print("CHILD_FINISHED_WITHOUT_KILL")
'''


def _run_ann_chaos_child(tmp_path, bomb_arm, src, index_path, ckpt, tag,
                         compact_every=0):
    import signal
    import subprocess
    import sys

    script = tmp_path / "ann_chaos_child.py"
    script.write_text(
        _ANN_CHAOS_CHILD.format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    )
    log = open(tmp_path / f"ann_chaos_{tag}.log", "w")
    p = subprocess.Popen(
        [sys.executable, str(script), bomb_arm, str(src), str(index_path), str(ckpt),
         str(compact_every)],
        stdout=log, stderr=log, start_new_session=True,
    )
    try:
        rc = p.wait(timeout=300)
    finally:
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        log.close()
    return rc


def test_ann_ingest_kill9_restart_exactly_once(spark, sf_dir, tmp_path):
    """REAL kill -9 across the streaming ANN sink (the stream_soak --chaos
    discipline applied here): a subprocess driver SIGKILLs ITSELF right
    after stamping the batch-1 marker — marker durable, append never ran,
    checkpoint uncommitted — then a clean relaunch drains from the
    checkpoint. The replayed batch must land EXACTLY once (the entry
    marker routes it through the dedupe path) and every streamed id must
    be present with no duplicates."""
    import signal

    root, base = _mk_ivf_tree(spark, sf_dir, tmp_path)
    pool = (
        _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 1).limit(40).collect()
    )
    src = tmp_path / "vin_chaos"
    src.mkdir()
    _write_batch_file(str(src), [(r["vec_id"], list(r["embedding"])) for r in pool[:20]], "b0.json")
    _write_batch_file(str(src), [(r["vec_id"], list(r["embedding"])) for r in pool[20:]], "b1.json")
    ckpt = tmp_path / "ckpt_chaos"

    rc = _run_ann_chaos_child(tmp_path, "kill_after_marker_b1", src, root, ckpt, "killed")
    assert rc == -signal.SIGKILL  # the bomb fired
    assert open(f"{root}/{MARKER}").read() == "1"  # marker survived the kill

    rc = _run_ann_chaos_child(tmp_path, "none", src, root, ckpt, "restart")
    assert rc == 0

    asg = load_ivf_index(spark, root)[1]
    got = [r["vec_id"] for r in asg.filter(F.col("vec_id") % 2 == 1).collect()]
    assert sorted(got) == sorted(r["vec_id"] for r in pool)  # all present, once
    assert asg.count() == base.count() + len(pool)


def test_ingest_repairs_torn_compaction_before_append(spark, sf_dir, tmp_path):
    """A compact_every crash between the swap's two renames leaves the
    live tree missing with the committed replacement parked. The next
    ingest must REPAIR FIRST: with dedupe='auto' on the replay path the
    anti-join would otherwise throw on the missing live tree every
    restart, and with dedupe=False the append would silently recreate a
    live tree holding ONLY the replayed batch (the parked full history
    then discarded by the next compaction)."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.sources import fsio

    root, base = _mk_ivf_tree(spark, sf_dir, tmp_path)
    n_base = base.count()
    kw = dict(kind="ivf", corpus_id="vec_id", vec_col="embedding")

    def tear_swap():
        meta = spark.read.json(f"{root}/meta").first()
        fsio.delete(f"{root}/assignments__compacting", spark=spark)
        (
            spark.read.parquet(f"{root}/assignments")
            .repartition(int(meta["n_lists"]), "list_id")
            .write.partitionBy("list_id").mode("error")
            .parquet(f"{root}/assignments__compacting")
        )
        fsio.rename(f"{root}/assignments", f"{root}/assignments__old", spark=spark)

    odd = _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 1)

    # replay path (marker == batch id → dedupe anti-join): would throw
    # pre-repair; must heal the tree and land the batch exactly once
    batch0 = odd.filter(F.col("vec_id") < 60)
    n0 = batch0.count()
    fsio.write_text_atomic(f"{root}/{MARKER}", "0", spark=spark)
    tear_swap()
    assert ingest_batch_into_index(spark, root, batch0, 0, **kw) == n0
    asg = load_ivf_index(spark, root)[1]
    assert asg.count() == n_base + n0  # full history + batch, nothing lost

    # fast path (fresh batch id, dedupe=False): would silently truncate
    # the index to just this batch pre-repair
    batch1 = odd.filter(F.col("vec_id").between(61, 121))
    n1 = batch1.count()
    tear_swap()
    assert ingest_batch_into_index(
        spark, root, batch1, 1, **{**kw, "dedupe": False}
    ) == n1
    asg = load_ivf_index(spark, root)[1]
    assert asg.count() == n_base + n0 + n1
    ids = [r["vec_id"] for r in asg.collect()]
    assert len(ids) == len(set(ids))


def test_ingest_owner_lease_single_writer(spark, sf_dir, tmp_path):
    """The _ingest_owner lease: an index adopted by one topology
    (identified by its checkpoint dir) refuses a second topology with a
    DIFFERENT checkpoint — concurrent writers would interleave markers
    and corrupt replay detection — while a same-checkpoint restart and
    an explicit takeover both proceed."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.ann_ingest import OWNER

    root, base = _mk_ivf_tree(spark, sf_dir, tmp_path)
    rows = (
        _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 1).limit(10).collect()
    )
    src = tmp_path / "vin_lease"
    src.mkdir()
    _write_batch_file(str(src), [(r["vec_id"], list(r["embedding"])) for r in rows], "b0.json")
    ck_a, ck_b = str(tmp_path / "ck_a"), str(tmp_path / "ck_b")

    stream = spark.readStream.schema(VEC_SCHEMA).json(str(src))
    q = start_ann_index_ingest(stream, root, ck_a, available_now=True)
    q.awaitTermination(180)
    assert not q.isActive
    assert open(f"{root}/{OWNER}").read() == ck_a

    # a different topology (different checkpoint) is refused
    with pytest.raises(ValueError, match="owned by"):
        start_ann_index_ingest(
            spark.readStream.schema(VEC_SCHEMA).json(str(src)),
            root, ck_b, available_now=True,
        )
    # same checkpoint restarts fine (no new data → drains immediately)
    q2 = start_ann_index_ingest(
        spark.readStream.schema(VEC_SCHEMA).json(str(src)),
        root, ck_a, available_now=True,
    )
    q2.awaitTermination(180)
    # explicit takeover re-stamps the lease for the new topology
    q3 = start_ann_index_ingest(
        spark.readStream.schema(VEC_SCHEMA).json(str(src)),
        root, ck_b, available_now=True, takeover=True,
    )
    q3.awaitTermination(180)
    assert open(f"{root}/{OWNER}").read() == ck_b
    # every id landed exactly once through all of it
    asg = load_ivf_index(spark, root)[1]
    assert asg.count() == base.count() + len(rows)
    assert asg.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0


def test_sharded_stream_kill9_mid_compaction_swap(spark, sf_dir, tmp_path):
    """REAL kill -9 INSIDE a sharded compaction swap under the streaming
    sink: with compact_every=1 the child SIGKILLs itself right after the
    swap's first rename on shard 0 (live tree gone, committed
    __compacting parked — the torn window). A clean relaunch must heal
    through the ingest's repair-before-append (no human repair call):
    every streamed id exactly once, disjoint cover intact, layout fully
    compacted, no swap residue on any shard."""
    import signal

    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        COMPACT_COMMIT_MARKER,
        build_sharded_ivf_index,
        load_sharded_ivf_index,
        persist_sharded_ivf_index,
    )

    base = _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 0)
    root = str(tmp_path / "sivf_chaos_idx")
    persist_sharded_ivf_index(
        build_sharded_ivf_index(base, n_shards=2, n_lists=6),
        root, mode="overwrite",
    )
    pool = (
        _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 1).limit(30).collect()
    )
    src = tmp_path / "vin_sivf_chaos"
    src.mkdir()
    _write_batch_file(str(src), [(r["vec_id"], list(r["embedding"])) for r in pool[:15]], "b0.json")
    _write_batch_file(str(src), [(r["vec_id"], list(r["embedding"])) for r in pool[15:]], "b1.json")
    ckpt = tmp_path / "ckpt_sivf_chaos"

    rc = _run_ann_chaos_child(
        tmp_path, "kill_mid_swap_shard0", src, root, ckpt, "sivf_killed",
        compact_every=1,
    )
    assert rc == -signal.SIGKILL  # the bomb fired
    # the torn state the kill left: shard 0's live tree missing, the
    # committed (stamp-carrying) compaction tree parked
    s0 = f"{root}/shard=00000"
    assert not os.path.exists(f"{s0}/assignments")
    assert os.path.exists(f"{s0}/assignments__compacting/{COMPACT_COMMIT_MARKER}")

    rc = _run_ann_chaos_child(
        tmp_path, "none", src, root, ckpt, "sivf_restart", compact_every=1,
    )
    assert rc == 0

    loaded = load_sharded_ivf_index(spark, root)
    got = sorted(
        r["vec_id"]
        for _, asg in loaded
        for r in asg.filter(F.col("vec_id") % 2 == 1).collect()
    )
    assert got == sorted(r["vec_id"] for r in pool)  # all present, exactly once
    assert sum(a.count() for _, a in loaded) == base.count() + len(pool)
    for s, (_, asg) in enumerate(loaded):
        assert asg.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(2)) != s
        ).count() == 0, s
    for s in range(2):
        sd = f"{root}/shard={s:05d}"
        assert not os.path.exists(f"{sd}/assignments__old")
        assert not os.path.exists(f"{sd}/assignments__compacting")
        for d, _, files in os.walk(f"{sd}/assignments"):
            assert sum(1 for f in files if f.endswith(".parquet")) <= 1, d


def test_stream_ingest_policy_driven_compaction(spark, sf_dir, tmp_path):
    """compact_every='auto': the sink compacts on the LAYOUT POLICY (the
    files-per-dir gauge past compact_files_threshold), not a fixed
    cadence. With a tight threshold the appends trigger compaction and
    the final tree is one file per dir; with a loose threshold the same
    stream never compacts and the per-append files remain. A bogus
    compact_every raises."""
    odd = _base_corpus(spark, sf_dir).filter(F.col("vec_id") % 2 == 1).limit(40).collect()

    def run(tag, threshold):
        root, base = _mk_ivf_tree(spark, sf_dir, tmp_path / tag)
        src = tmp_path / f"vin_{tag}"
        src.mkdir()
        for i in range(3):
            _write_batch_file(
                str(src),
                [(r["vec_id"] + 10_000 * i, list(r["embedding"])) for r in odd[:10]],
                f"b{i}.json",
            )
        stream = (
            spark.readStream.schema(VEC_SCHEMA)
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        q = start_ann_index_ingest(
            stream, root, str(tmp_path / f"ck_{tag}"),
            compact_every="auto", compact_files_threshold=threshold,
            available_now=True,
        )
        q.awaitTermination(180)
        assert not q.isActive
        worst = 0
        for d, _, files in os.walk(os.path.join(root, "assignments")):
            worst = max(worst, sum(1 for f in files if f.endswith(".parquet")))
        asg = load_ivf_index(spark, root)[1]
        assert asg.count() == base.count() + 3 * 10
        return worst

    # tight threshold: the last batch pushed files/dir past 1 → compacted
    assert run("tight", 1) == 1
    # loose threshold: never compacts, the three appends' files remain
    assert run("loose", 99) > 1

    root, _ = _mk_ivf_tree(spark, sf_dir, tmp_path / "badarg")
    stream = spark.readStream.schema(VEC_SCHEMA).json(str(tmp_path / "vin_tight"))
    with pytest.raises(ValueError, match="compact_every"):
        start_ann_index_ingest(
            stream, root, str(tmp_path / "ck_bad"), compact_every="yes"
        )


def test_stream_surfaces_rebuild_due(spark, sf_dir, tmp_path):
    """VERDICT r13 ask #6: a drifted stream must SURFACE rebuild_due
    instead of appending into a degrading index silently. Three
    micro-batches of near-identical vectors pile into one frozen list;
    the callback fires once per batch whose post-append gauge says
    rebuild_due, with the plan rows as payload; 'raise' mode fails the
    stream instead; PQ trees (no occupancy gauge) refuse the option at
    start."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
        persist_pq_index,
        pq_index,
    )

    root, base = _mk_ivf_tree(spark, sf_dir, tmp_path)
    src = tmp_path / "vin_drift"
    src.mkdir()
    dim = len(base.first()["embedding"])
    for b in range(3):
        rows = [
            (
                9_000_000 + b * 1000 + i,
                [0.5 + ((i * dim + j) % 41 - 20) / 400.0 for j in range(dim)],
            )
            for i in range(120)
        ]
        _write_batch_file(str(src), rows, f"b{b}.json")
    fired = []
    stream = spark.readStream.schema(VEC_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = start_ann_index_ingest(
        stream, root, str(tmp_path / "ckpt_drift"), available_now=True,
        on_rebuild_due=fired.append,
        plan_thresholds={"skew_threshold": 3.0, "min_rows_for_rebuild": 100},
    )
    q.awaitTermination(240)
    assert not q.isActive
    # the drift fires on at least the later batches, exactly once per
    # fired batch, and every payload row carries the verdict
    assert 1 <= len(fired) <= 3
    assert all(
        all(r["action"] == "rebuild_due" for r in rows) for rows in fired
    )

    # 'raise' mode: the same drifted index now fails the next batch
    _write_batch_file(str(src), [(9_500_000, [0.5] * dim)], "b_extra.json")
    q2 = start_ann_index_ingest(
        spark.readStream.schema(VEC_SCHEMA).json(str(src)),
        root, str(tmp_path / "ckpt_drift_raise"), available_now=True,
        on_rebuild_due="raise",
        plan_thresholds={"skew_threshold": 3.0, "min_rows_for_rebuild": 100},
        takeover=True,
    )
    with pytest.raises(Exception, match="rebuild_due"):
        q2.awaitTermination(240)

    # PQ: no occupancy gauge — the option is refused at start
    pq_root = str(tmp_path / "pq_no_gauge")
    persist_pq_index(pq_index(base, m=4), pq_root, m=4, mode="overwrite")
    with pytest.raises(ValueError, match="occupancy gauge"):
        start_ann_index_ingest(
            spark.readStream.schema(VEC_SCHEMA).json(str(src)),
            pq_root, str(tmp_path / "ckpt_pq_refuse"),
            on_rebuild_due=lambda rows: None,
        )
