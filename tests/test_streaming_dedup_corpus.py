"""Cross-batch corpus dedup ingest (streaming/dedup.start_corpus_dedup_ingest):
classify-against-all-history semantics, within-batch dedup, partition-
versioned idempotence, and the replay guard (base = batch < current id)."""

import json

from pyspark.sql import functions as F, types as T

from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.dedup import (
    start_corpus_dedup_ingest,
)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _feed(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run(spark, src, corpus, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_corpus_dedup_ingest(
        stream, str(corpus), str(ckpt), "doc_id", "text", available_now=True
    )
    q.awaitTermination(120)


def _log(spark, corpus):
    return {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in spark.read.parquet(f"{corpus}/log").collect()
    }


def test_accumulated_history_dedup(spark, tmp_path):
    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    _feed(src, "b1.json", [
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "delta epsilon zeta"},
        {"doc_id": 3, "text": "alpha beta gamma"},   # within-batch dup of 1
    ])
    _run(spark, src, corpus, ckpt)
    log = _log(spark, str(corpus))
    assert log[1] == ("fresh", None)
    assert log[2] == ("fresh", None)
    assert log[3] == ("batch_dup", 1)

    # batch 2: one dup of history, one fresh
    _feed(src, "b2.json", [
        {"doc_id": 10, "text": "delta epsilon zeta"},  # exact dup of 2
        {"doc_id": 11, "text": "eta theta iota"},
    ])
    _run(spark, src, corpus, ckpt)
    log = _log(spark, str(corpus))
    assert log[10] == ("exact_dup", 2)
    assert log[11] == ("fresh", None)

    # batch 3: dup of a batch-2 landing — history keeps accumulating
    _feed(src, "b3.json", [
        {"doc_id": 20, "text": "eta theta iota"},
    ])
    _run(spark, src, corpus, ckpt)
    log = _log(spark, str(corpus))
    assert log[20] == ("exact_dup", 11)

    # the corpus holds exactly the fresh docs, batch-partitioned
    data = spark.read.parquet(f"{corpus}/data")
    assert {r["doc_id"] for r in data.collect()} == {1, 2, 11}
    assert {r["batch"] for r in data.collect()} == {0, 1}
    # index is slim: id + 8-byte hash per landed doc
    idx = spark.read.parquet(f"{corpus}/index")
    assert idx.count() == 3 and set(idx.columns) == {"doc_id", "_h", "batch"}


def test_replay_does_not_self_poison(spark, tmp_path):
    """Crash between output landing and checkpoint commit: the replayed
    batch (same batch_id) must classify against batch < id — its own
    half-landed rows are invisible, so the rerun reproduces identical
    results instead of marking every doc a dup of itself."""
    import shutil

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    _feed(src, "b1.json", [
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "delta epsilon zeta"},
    ])
    _run(spark, src, corpus, ckpt)
    before = _log(spark, str(corpus))
    assert before[1][0] == "fresh" and before[2][0] == "fresh"

    shutil.rmtree(ckpt)  # lose the checkpoint: batch re-delivered as id 0
    _run(spark, src, corpus, ckpt)
    after = _log(spark, str(corpus))
    assert after == before
    assert spark.read.parquet(f"{corpus}/data").count() == 2


def test_matches_batch_incremental_dedup(spark, tmp_path):
    """Stream ≡ batch: the streaming loop's batch-2 classifications equal
    operators.dedup.incremental_dedup's exact path over (new=batch2,
    base=batch1)."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import incremental_dedup

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    b1 = [{"doc_id": i, "text": f"common words plus token {i % 3}"}
          for i in range(6)]
    b2 = [{"doc_id": 100 + i, "text": f"common words plus token {i}"}
          for i in range(5)]
    _feed(src, "b1.json", b1)
    _run(spark, src, corpus, ckpt)
    _feed(src, "b2.json", b2)
    _run(spark, src, corpus, ckpt)

    log = _log(spark, str(corpus))
    base = spark.read.parquet(f"{corpus}/data").filter("batch = 0").select(
        "doc_id", "text"
    )
    new = spark.createDataFrame([(r["doc_id"], r["text"]) for r in b2],
                                "doc_id long, text string")
    ref = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in incremental_dedup(new, base, "doc_id", "text").collect()
    }
    for did, (status, match) in ref.items():
        if status == "exact_dup":
            assert log[did] == ("exact_dup", match)
        elif status == "fresh":
            assert log[did][0] == "fresh"


def _run_compact(spark, src, corpus, ckpt, every):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_corpus_dedup_ingest(
        stream, str(corpus), str(ckpt), "doc_id", "text",
        available_now=True, compact_every=every,
    )
    q.awaitTermination(120)


def test_compaction_preserves_classification(spark, tmp_path):
    """With compact_every=2 the classify-against-all-history semantics are
    unchanged across fold points, and the index tree actually shrinks to
    one compact tree + only the not-yet-folded batch dirs."""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    _feed(src, "b1.json", [{"doc_id": 1, "text": "alpha beta gamma"},
                           {"doc_id": 2, "text": "delta epsilon zeta"}])
    _run_compact(spark, src, corpus, ckpt, 2)
    _feed(src, "b2.json", [{"doc_id": 10, "text": "eta theta iota"}])
    _run_compact(spark, src, corpus, ckpt, 2)
    _feed(src, "b3.json", [  # batch 2: triggers the fold, classifies first
        {"doc_id": 20, "text": "alpha beta gamma"},   # dup of batch-0 doc 1
        {"doc_id": 21, "text": "kappa lambda mu"},
    ])
    _run_compact(spark, src, corpus, ckpt, 2)
    log = _log(spark, str(corpus))
    assert log[20] == ("exact_dup", 1)
    assert log[21] == ("fresh", None)

    # fold happened at batch 2 → window run w3; folded batch dirs are gone
    names = sorted(os.listdir(f"{corpus}/index_compact"))
    assert names == ["run=w3"]
    batch_dirs = [n for n in os.listdir(f"{corpus}/index")
                  if n.startswith("batch=")]
    assert batch_dirs == []

    # batch 3 classifies against the COMPACTED history
    _feed(src, "b4.json", [
        {"doc_id": 30, "text": "eta theta iota"},      # dup of batch-1 doc 10
        {"doc_id": 31, "text": "kappa lambda mu"},     # dup of batch-2 doc 21
        {"doc_id": 32, "text": "nu xi omicron"},
    ])
    _run_compact(spark, src, corpus, ckpt, 2)
    log = _log(spark, str(corpus))
    assert log[30] == ("exact_dup", 10)
    assert log[31] == ("exact_dup", 21)
    assert log[32] == ("fresh", None)
    # full corpus content is exactly the fresh docs across all batches
    data = spark.read.parquet(f"{corpus}/data")
    assert {r["doc_id"] for r in data.collect()} == {1, 2, 10, 21, 32}


def test_compaction_crash_residue_is_harmless(spark, tmp_path):
    """Crash interleaving: a folded batch dir that survived (delete never
    ran) must not double-classify — the reader takes the compact tree and
    only batch >= upto from the per-batch tree."""
    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    _feed(src, "b1.json", [{"doc_id": 1, "text": "alpha beta gamma"}])
    _run_compact(spark, src, corpus, ckpt, 2)
    _feed(src, "b2.json", [{"doc_id": 2, "text": "delta epsilon zeta"}])
    _run_compact(spark, src, corpus, ckpt, 2)
    _feed(src, "b3.json", [{"doc_id": 3, "text": "eta theta iota"}])
    _run_compact(spark, src, corpus, ckpt, 2)  # fold at batch 2 → upto=3

    # resurrect a folded dir with rows ALREADY in the window run
    spark.createDataFrame(
        [(1, spark.read.parquet(f"{corpus}/index_compact/run=w3")
             .filter("doc_id = 1").collect()[0]["_h"])],
        "doc_id long, _h long",
    ).write.mode("overwrite").parquet(f"{corpus}/index/batch=0")

    _feed(src, "b4.json", [
        {"doc_id": 40, "text": "alpha beta gamma"},  # dup of resurrected doc
        {"doc_id": 41, "text": "pi rho sigma"},
    ])
    _run_compact(spark, src, corpus, ckpt, 2)
    log = _log(spark, str(corpus))
    assert log[40] == ("exact_dup", 1)
    assert log[41] == ("fresh", None)


def test_bucketed_compaction_layout_and_probe(spark, tmp_path):
    """bucket_target_rows=1 forces one bucket per history row at the fold:
    the window run must come out hash-bucketed (bucket=<k>/ subdirs +
    _meta json), and classification against the bucketed history — where
    the probe reads ONLY the incoming batch's buckets — must be identical
    to the flat-tree semantics."""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    def run(every=2):
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_corpus_dedup_ingest(
            stream, str(corpus), str(ckpt), "doc_id", "text",
            available_now=True, compact_every=every, bucket_target_rows=1,
        )
        q.awaitTermination(120)

    _feed(src, "b1.json", [{"doc_id": 1, "text": "alpha beta gamma"},
                           {"doc_id": 2, "text": "delta epsilon zeta"}])
    run()
    _feed(src, "b2.json", [{"doc_id": 10, "text": "eta theta iota"}])
    run()
    _feed(src, "b3.json", [{"doc_id": 20, "text": "kappa lambda mu"}])
    run()  # fold at batch 2 → upto=3, 4 history rows → 4 buckets

    tree = f"{corpus}/index_compact/run=w3"
    buckets = sorted(n for n in os.listdir(tree) if n.startswith("bucket="))
    with open(f"{tree}/_meta") as fh:
        meta = json.load(fh)
    assert meta["nb"] == 4 and meta["rows"] == 4
    assert (meta["lo"], meta["hi"]) == (0, 3)
    assert 1 <= len(buckets) <= 4  # hash collisions may merge buckets
    assert os.path.exists(f"{tree}/_SUCCESS")

    # dups of each pre-fold batch + a fresh doc, classified via the
    # bucket-pruned probe
    _feed(src, "b4.json", [
        {"doc_id": 30, "text": "alpha beta gamma"},   # dup of batch-0 doc 1
        {"doc_id": 31, "text": "eta theta iota"},     # dup of batch-1 doc 10
        {"doc_id": 32, "text": "kappa lambda mu"},    # dup of batch-2 doc 20
        {"doc_id": 33, "text": "nu xi omicron"},      # fresh
    ])
    run()
    log = _log(spark, str(corpus))
    assert log[30] == ("exact_dup", 1)
    assert log[31] == ("exact_dup", 10)
    assert log[32] == ("exact_dup", 20)
    assert log[33] == ("fresh", None)


def test_uncommitted_compact_tree_is_ignored(spark, tmp_path):
    """Crashed-fold residue — a legacy upto= dir with no commit marker AND
    a run= dir with no _meta — must be invisible: the reader takes only
    COMMITTED runs. Without the gate, an empty upto=9 would shadow the
    real history (per-batch filter batch >= 9 drops everything) and every
    dup would land again as fresh."""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    _feed(src, "b1.json", [{"doc_id": 1, "text": "alpha beta gamma"}])
    _run_compact(spark, src, corpus, ckpt, 2)
    _feed(src, "b2.json", [{"doc_id": 2, "text": "delta epsilon zeta"}])
    _run_compact(spark, src, corpus, ckpt, 2)
    _feed(src, "b3.json", [{"doc_id": 3, "text": "eta theta iota"}])
    _run_compact(spark, src, corpus, ckpt, 2)  # committed fold → run=w3
    assert os.path.exists(f"{corpus}/index_compact/run=w3/_meta")

    os.makedirs(f"{corpus}/index_compact/upto=9")    # crashed legacy fold
    os.makedirs(f"{corpus}/index_compact/run=w9")    # crashed run write

    _feed(src, "b4.json", [
        {"doc_id": 40, "text": "alpha beta gamma"},  # dup of folded doc 1
        {"doc_id": 41, "text": "pi rho sigma"},
    ])
    _run_compact(spark, src, corpus, ckpt, 2)
    log = _log(spark, str(corpus))
    assert log[40] == ("exact_dup", 1)
    assert log[41] == ("fresh", None)


def test_first_fold_crash_is_never_elected(spark, tmp_path):
    """The FIRST-ever fold crashes mid-write (upto=N dir exists with no
    _SUCCESS and no _nb, and there is NO prior committed tree): the
    crashed dir must be ignored entirely — upto stays 0, the intact
    index/batch=* history classifies incoming dups, and the batch dirs
    survive. (Electing the crashed tree would set upto to its id, hide
    all per-batch history behind the batch >= upto filter, and land every
    dup as fresh — permanent silent loss of dedup history.)"""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    _feed(src, "b1.json", [{"doc_id": 1, "text": "alpha beta gamma"}])
    _run(spark, src, corpus, ckpt)  # no compaction: history = batch dirs

    # the simulated crash: a bare half-written tree, no marker, no meta,
    # no predecessor — in BOTH layouts
    os.makedirs(f"{corpus}/index_compact/upto=1")
    os.makedirs(f"{corpus}/index_compact/run=w1")

    _feed(src, "b2.json", [
        {"doc_id": 10, "text": "alpha beta gamma"},  # dup of batch-0 doc 1
        {"doc_id": 11, "text": "pi rho sigma"},
    ])
    _run(spark, src, corpus, ckpt)
    log = _log(spark, str(corpus))
    assert log[10] == ("exact_dup", 1)
    assert log[11] == ("fresh", None)
    assert os.path.isdir(f"{corpus}/index/batch=0")  # history survived


def test_over_cap_dup_storm_falls_back_to_join_pruning(spark, tmp_path):
    """verify_collect_cap=2 forces the over-cap path on a 5-dup batch:
    candidate verification must switch from the driver-collected IN list
    to the checkpointed-candidate semi-join and classify identically."""
    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    def run():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_corpus_dedup_ingest(
            stream, str(corpus), str(ckpt), "doc_id", "text",
            available_now=True, verify_collect_cap=2,
        )
        q.awaitTermination(120)

    texts = [f"w{i} x{i} y{i}" for i in range(5)]
    _feed(src, "b1.json", [
        {"doc_id": i, "text": texts[i]} for i in range(5)
    ])
    run()
    # 5 history dups (over the cap of 2) + 1 fresh
    _feed(src, "b2.json", [
        {"doc_id": 100 + i, "text": texts[i]} for i in range(5)
    ] + [{"doc_id": 200, "text": "fresh only text"}])
    run()
    log = _log(spark, str(corpus))
    for i in range(5):
        assert log[100 + i] == ("exact_dup", i)
    assert log[200] == ("fresh", None)


def test_legacy_tree_missing_nb_reads_all_buckets(spark, tmp_path):
    """A LEGACY (pre-LSM) compact tree whose _nb meta was lost in a crash
    window but whose parquet job committed (_SUCCESS present) must still
    be selected, and without nb the probe cannot bucket-prune — it must
    read ALL buckets (a correct superset), never miss a dup. Requires >8
    buckets so the pruning branch (the one that needs nb) is live."""
    import os
    from pyspark.sql import Row

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    # seed an imported legacy corpus: 20 docs, bucket per row
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha{i} beta{i} gamma{i}", batch=0)
         for i in range(20)]
    ).withColumn("batch", F.col("batch").cast("int"))
    (docs.repartition(1).sortWithinPartitions("doc_id")
         .write.partitionBy("batch").mode("overwrite")
         .parquet(f"{corpus}/data"))
    tree = f"{corpus}/index_compact/upto=1"
    idx = docs.select(
        "doc_id", F.xxhash64("text").alias("_h"), "batch"
    ).withColumn("bucket", F.pmod(F.col("_h"), F.lit(20)).cast("int"))
    (idx.repartition(20, "bucket").write.partitionBy("bucket")
        .mode("overwrite").parquet(tree))
    # the simulated crash: parquet committed, _nb never written
    assert os.path.exists(f"{tree}/_SUCCESS")
    buckets = [n for n in os.listdir(tree) if n.startswith("bucket=")]
    assert len(buckets) > 8, "precondition: pruning branch must be live"
    assert not os.path.exists(f"{tree}/_nb")

    _feed(src, "b1.json", [
        {"doc_id": 300, "text": "alpha7 beta7 gamma7"},  # dup of legacy doc 7
        {"doc_id": 301, "text": "alpha3 beta3 gamma3"},  # dup of legacy doc 3
        {"doc_id": 302, "text": "pi rho sigma"},         # fresh
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_corpus_dedup_ingest(
        stream, str(corpus), str(ckpt), "doc_id", "text",
        available_now=True, first_batch_id=1,
    )
    q.awaitTermination(120)
    log = _log(spark, str(corpus))
    assert log[300] == ("exact_dup", 7)
    assert log[301] == ("exact_dup", 3)
    assert log[302] == ("fresh", None)


def test_tiered_merge_bounds_runs_and_preserves_history(spark, tmp_path):
    """compact_every=1 with equal-size batches drives the binary-counter
    tiering: same-tier window runs must merge (inputs deleted, one output
    run with a folds list), the live run count stays logarithmic instead
    of one-run-per-fold, and classification against the merged history is
    unchanged — including dups of docs whose index rows have been through
    multiple promotions."""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    def run():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_corpus_dedup_ingest(
            stream, str(corpus), str(ckpt), "doc_id", "text",
            available_now=True, compact_every=1, bucket_target_rows=2,
        )
        q.awaitTermination(120)

    # batches 0..3: two fresh docs each → folds at 1,2,3
    for b in range(4):
        _feed(src, f"b{b}.json", [
            {"doc_id": 10 * b, "text": f"unique text {b} zero"},
            {"doc_id": 10 * b + 1, "text": f"unique text {b} one"},
        ])
        run()

    root = f"{corpus}/index_compact"
    names = sorted(os.listdir(root))
    # fold@1 → w2(4 rows); fold@2 → w3(2); fold@3 → w4(2) then the
    # cascade: w3+w4 → m4.0(4), w2+m4.0 → m4.1(8). Inputs must be gone.
    assert names == ["run=m4.1"], names
    with open(f"{root}/run=m4.1/_meta") as fh:
        meta = json.load(fh)
    assert meta["rows"] == 8 and (meta["lo"], meta["hi"]) == (0, 4)
    assert set(meta["folds"]) == {"run=w2", "run=m4.0"}

    # batch 4: dups of batch-0 and batch-3 docs (both live only in the
    # twice-promoted merge run) + a fresh doc
    _feed(src, "b4.json", [
        {"doc_id": 100, "text": "unique text 0 zero"},
        {"doc_id": 101, "text": "unique text 3 one"},
        {"doc_id": 102, "text": "never seen before"},
    ])
    run()
    log = _log(spark, str(corpus))
    assert log[100] == ("exact_dup", 0)
    assert log[101] == ("exact_dup", 31)
    assert log[102] == ("fresh", None)


def test_legacy_tree_migrates_in_place_under_lsm_folds(spark, tmp_path):
    """A corpus compacted by the pre-r10 single-tree layout (committed
    upto=N tree + _nb) keeps working unmodified when the stream resumes
    with LSM folds: the legacy tree serves as the frozen base run (never
    merged — counting its rows would be the O(history) pass the LSM
    removes), new window runs tier among themselves above it, and
    classification sees both."""
    import os
    from pyspark.sql import Row

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    # the r9-layout corpus: data/batch=0,1 + committed upto=2 tree
    imported = [(1, "alpha beta gamma", 0), (2, "delta epsilon zeta", 1)]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, batch=b) for i, t, b in imported]
    ).withColumn("batch", F.col("batch").cast("int"))
    (docs.repartition(2, "batch").sortWithinPartitions("doc_id")
         .write.partitionBy("batch").mode("overwrite")
         .parquet(f"{corpus}/data"))
    tree = f"{corpus}/index_compact/upto=2"
    idx = docs.select(
        "doc_id", F.xxhash64("text").alias("_h"), "batch"
    ).withColumn("bucket", F.pmod(F.col("_h"), F.lit(2)).cast("int"))
    (idx.repartition(2, "bucket").write.partitionBy("bucket")
        .mode("overwrite").parquet(tree))
    with open(f"{tree}/_nb", "w") as fh:
        fh.write("2")

    def run():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_corpus_dedup_ingest(
            stream, str(corpus), str(ckpt), "doc_id", "text",
            available_now=True, compact_every=1, bucket_target_rows=2,
            first_batch_id=2,
        )
        q.awaitTermination(120)

    # three streamed batches: folds at 3 and 4 create w-runs that merge
    # among themselves while the legacy tree stays untouched
    _feed(src, "b1.json", [{"doc_id": 10, "text": "eta theta iota"},
                           {"doc_id": 11, "text": "kappa lambda mu"}])
    run()
    _feed(src, "b2.json", [
        {"doc_id": 20, "text": "alpha beta gamma"},  # dup of LEGACY doc 1
        {"doc_id": 21, "text": "eta theta iota"},    # dup of streamed doc 10
        {"doc_id": 22, "text": "nu xi omicron"},
    ])
    run()
    _feed(src, "b3.json", [
        {"doc_id": 30, "text": "delta epsilon zeta"},  # dup of LEGACY doc 2
        {"doc_id": 31, "text": "nu xi omicron"},       # dup of streamed 22
    ])
    run()
    log = _log(spark, str(corpus))
    assert log[20] == ("exact_dup", 1)
    assert log[21] == ("exact_dup", 10)
    assert log[30] == ("exact_dup", 2)
    assert log[31] == ("exact_dup", 22)
    assert log[11] == ("fresh", None) and log[22] == ("fresh", None)
    names = sorted(os.listdir(f"{corpus}/index_compact"))
    assert "upto=2" in names  # legacy base untouched
    assert any(n.startswith("run=") for n in names)  # LSM runs above it


def test_merge_crash_input_residue_is_cleaned_and_harmless(spark, tmp_path):
    """Crash window between a merge output's _meta commit and the input
    deletes: a resurrected input run (still committed, still readable)
    must be dropped from the live set by the folds-list cleanup — its
    rows never double-classify — and the residue dir itself is deleted
    on the next micro-batch (resumable cleanup)."""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    def run():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_corpus_dedup_ingest(
            stream, str(corpus), str(ckpt), "doc_id", "text",
            available_now=True, compact_every=1, bucket_target_rows=2,
        )
        q.awaitTermination(120)

    for b in range(4):
        _feed(src, f"b{b}.json", [
            {"doc_id": 10 * b, "text": f"unique text {b} zero"},
            {"doc_id": 10 * b + 1, "text": f"unique text {b} one"},
        ])
        run()
    root = f"{corpus}/index_compact"
    assert sorted(os.listdir(root)) == ["run=m4.1"]

    # resurrect a folded input as a COMMITTED run carrying a real row of
    # the live history (the nastiest residue: readable, overlapping)
    row = spark.read.parquet(f"{root}/run=m4.1").filter("doc_id = 0")
    victim = f"{root}/run=w2"
    row.select("doc_id", "_h", "batch").withColumn(
        "bucket", F.lit(0)
    ).write.partitionBy("bucket").mode("overwrite").parquet(victim)
    with open(f"{victim}/_meta", "w") as fh:
        json.dump({"nb": 1, "rows": 1, "lo": 0, "hi": 2, "folds": []}, fh)

    _feed(src, "b4.json", [
        {"doc_id": 100, "text": "unique text 0 zero"},  # dup of doc 0
        {"doc_id": 101, "text": "never seen before"},
    ])
    run()
    log = _log(spark, str(corpus))
    assert log[100] == ("exact_dup", 0)
    assert log[101] == ("fresh", None)
    assert not os.path.exists(victim)  # resumable cleanup finished the fold


def test_first_batch_id_bootstraps_over_imported_corpus(spark, tmp_path):
    """A one-time batch import (data/batch=* + committed bucketed compact
    tree, the layout a compact_every fold writes) becomes prior history
    from the stream's FIRST trigger when first_batch_id points above it."""
    import os
    from pyspark.sql import Row

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    # import two batches' worth of docs the way a fold would lay them out
    imported = [(1, "alpha beta gamma", 0), (2, "delta epsilon zeta", 1)]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, batch=b) for i, t, b in imported]
    ).withColumn("batch", F.col("batch").cast("int"))  # index schema is int
    (docs.repartition(2, "batch").sortWithinPartitions("doc_id")
         .write.partitionBy("batch").mode("overwrite")
         .parquet(f"{corpus}/data"))
    tree = f"{corpus}/index_compact/upto=2"
    idx = docs.select(
        "doc_id", F.xxhash64("text").alias("_h"), "batch"
    ).withColumn("bucket", F.pmod(F.col("_h"), F.lit(2)).cast("int"))
    (idx.repartition(2, "bucket").write.partitionBy("bucket")
        .mode("overwrite").parquet(tree))
    with open(f"{tree}/_nb", "w") as fh:
        fh.write("2")
    assert os.path.exists(f"{tree}/_SUCCESS")

    _feed(src, "b1.json", [
        {"doc_id": 50, "text": "alpha beta gamma"},   # dup of imported 1
        {"doc_id": 51, "text": "delta epsilon zeta"}, # dup of imported 2
        {"doc_id": 52, "text": "brand new text"},
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_corpus_dedup_ingest(
        stream, str(corpus), str(ckpt), "doc_id", "text",
        available_now=True, first_batch_id=2,
    )
    q.awaitTermination(120)
    log = _log(spark, str(corpus))
    assert log[50] == ("exact_dup", 1)
    assert log[51] == ("exact_dup", 2)
    assert log[52] == ("fresh", None)
    # the stream's own landing went ABOVE the imported range
    assert os.path.isdir(f"{corpus}/data/batch=2")


def test_randomized_stream_matches_reference_model(spark, tmp_path):
    """Seeded random stream vs an independent driver-side reference model,
    with every scale knob forced hostile at once: per-row buckets
    (bucket_target_rows=1), folds every 2 batches, and a verify cap of 5
    so some batches take the over-cap join path and others the bounded
    broadcast path. Classification must equal the model's regardless."""
    import random

    rng = random.Random(909)
    pool = [f"text {i} {'pad ' * (i % 3)}" for i in range(18)]

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    def run():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_corpus_dedup_ingest(
            stream, str(corpus), str(ckpt), "doc_id", "text",
            available_now=True, compact_every=2, bucket_target_rows=1,
            verify_collect_cap=5,
        )
        q.awaitTermination(180)

    # reference model: corpus maps text -> min FRESH id that landed it
    corpus_ref: dict[str, int] = {}
    expected: dict[int, tuple[str, int | None]] = {}
    next_id = 0
    for b in range(6):
        rows = []
        for _ in range(rng.randint(3, 12)):
            rows.append({"doc_id": next_id, "text": rng.choice(pool)})
            next_id += 1
        seen_in_batch: dict[str, int] = {}
        for r in rows:
            t = r["text"]
            if t in corpus_ref:
                expected[r["doc_id"]] = ("exact_dup", corpus_ref[t])
            elif t in seen_in_batch:
                expected[r["doc_id"]] = ("batch_dup", seen_in_batch[t])
            else:
                expected[r["doc_id"]] = ("fresh", None)
                seen_in_batch[t] = r["doc_id"]
        for t, i in seen_in_batch.items():
            corpus_ref[t] = i
        _feed(src, f"b{b}.json", rows)
        run()

    assert _log(spark, str(corpus)) == expected


def _run_sliced(spark, src, corpus, ckpt, metrics=None):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_corpus_dedup_ingest(
        stream, str(corpus), str(ckpt), "doc_id", "text",
        available_now=True, compact_every=1, bucket_target_rows=2,
        max_fold_rows=4, metrics=metrics,
    )
    q.awaitTermination(120)


def test_sliced_merge_bounds_fold_and_preserves_classification(spark, tmp_path):
    """max_fold_rows=4: the 8-row promotion (w2 + m4.0) must execute as
    hash-congruence slices across TWO folds — slice 0 at the fold that
    started it, slice 1 at the next — with classification correct while
    the merge is in flight (rows live in inputs + partial slices) and
    after completion (inputs retired, slice set = one virtual run)."""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    metrics: dict = {}

    for b in range(4):  # folds at 1,2,3: w2(4), then m4.0(4)=w3+w4, then
        _feed(src, f"b{b}.json", [  # the 8-row group starts slicing
            {"doc_id": 10 * b, "text": f"unique text {b} zero"},
            {"doc_id": 10 * b + 1, "text": f"unique text {b} one"},
        ])
        _run_sliced(spark, src, corpus, ckpt, metrics)

    root = f"{corpus}/index_compact"
    names = sorted(os.listdir(root))
    # slice 0 committed, inputs still alive (merge in flight)
    assert "run=m4.1.s0" in names and "run=w2" in names and "run=m4.0" in names
    folds = metrics["fold"]
    assert folds[-1]["slice"] == {"id": "m4.1", "slice": 0, "of": 2,
                                  "done": False}
    # per-fold merge work stays bounded: each merge OP is ≤ the cap, and
    # a fold does at most the cap-bounded small merges plus ONE slice —
    # here ≤ 2 ops × 4 rows, where the unsliced 8-row promotion alone
    # (plus the small merge) would have been 12
    assert all(f["merged_rows"] <= 8 for f in folds)

    # mid-flight classification: dups of rows living in inputs AND in the
    # committed slice must still be caught
    _feed(src, "b4.json", [
        {"doc_id": 100, "text": "unique text 0 zero"},   # in w2/slices
        {"doc_id": 101, "text": "unique text 2 one"},    # in m4.0
        {"doc_id": 102, "text": "brand new"},
    ])
    _run_sliced(spark, src, corpus, ckpt, metrics)  # fold@4: slice 1 (last)
    log = _log(spark, str(corpus))
    assert log[100] == ("exact_dup", 0)
    assert log[101] == ("exact_dup", 21)
    assert log[102] == ("fresh", None)
    names = sorted(os.listdir(root))
    assert "run=m4.1.s0" in names and "run=m4.1.s1" in names
    assert "run=w2" not in names and "run=m4.0" not in names  # retired
    assert metrics["fold"][-1]["slice"]["done"] is True

    # post-completion classification via the virtual run
    _feed(src, "b5.json", [
        {"doc_id": 200, "text": "unique text 1 zero"},  # only in the slices
        {"doc_id": 201, "text": "brand new"},           # dup of batch-4 doc
    ])
    _run_sliced(spark, src, corpus, ckpt, metrics)
    log = _log(spark, str(corpus))
    assert log[200] == ("exact_dup", 10)
    assert log[201] == ("exact_dup", 102)


def test_sliced_merge_uncommitted_slice_residue_is_rewritten(spark, tmp_path):
    """Crash hygiene for sliced merges: an uncommitted slice dir (no
    _meta — a crashed half-write of the NEXT slice) is invisible to the
    reader, the pending merge still resumes at that slice (overwriting
    the residue), the final slice carries the inputs in folds, and the
    inputs retire. Classification of a dup whose row lives in the
    crashed slice's hash class is unaffected throughout."""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"

    for b in range(4):
        _feed(src, f"b{b}.json", [
            {"doc_id": 10 * b, "text": f"unique text {b} zero"},
            {"doc_id": 10 * b + 1, "text": f"unique text {b} one"},
        ])
        _run_sliced(spark, src, corpus, ckpt)
    root = f"{corpus}/index_compact"
    assert os.path.isdir(f"{root}/run=m4.1.s0")

    # crashed half-write of slice 1: dir exists, no _meta
    os.makedirs(f"{root}/run=m4.1.s1")

    # drive one more batch: the pending merge resumes at slice 1 despite
    # the residue (overwrite), completes, and retires its inputs
    _feed(src, "b4.json", [{"doc_id": 100, "text": "unique text 3 one"}])
    _run_sliced(spark, src, corpus, ckpt)
    log = _log(spark, str(corpus))
    assert log[100] == ("exact_dup", 31)
    names = sorted(os.listdir(root))
    assert "run=w2" not in names and "run=m4.0" not in names
    with open(f"{root}/run=m4.1.s1/_meta") as fh:
        meta = json.load(fh)
    assert meta["part"] == {"id": "m4.1", "slice": 1, "of": 2,
                            "inputs": ["run=w2", "run=m4.0"]}
    assert set(meta["folds"]) == {"run=w2", "run=m4.0"}


def _import_legacy_tree(spark, corpus, hi, docs_rows, write_nb=True):
    """Lay out an imported corpus the pre-LSM way: data/batch=* + a
    cumulative upto=<hi> tree (2 hash buckets), optionally committed."""
    import os
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, batch=b) for i, t, b in docs_rows]
    ).withColumn("batch", F.col("batch").cast("int"))
    (docs.repartition(2, "batch").sortWithinPartitions("doc_id")
         .write.partitionBy("batch").mode("overwrite")
         .parquet(f"{corpus}/data"))
    tree = f"{corpus}/index_compact/upto={hi}"
    idx = docs.select(
        "doc_id", F.xxhash64("text").alias("_h"), "batch"
    ).withColumn("bucket", F.pmod(F.col("_h"), F.lit(2)).cast("int"))
    (idx.repartition(2, "bucket").write.partitionBy("bucket")
        .mode("overwrite").parquet(tree))
    if write_nb:
        with open(f"{tree}/_nb", "w") as fh:
            fh.write("2")
    else:
        os.remove(f"{tree}/_SUCCESS")  # simulate a marker-less import
    return tree


def test_unmarked_import_only_history_raises_then_heals(spark, tmp_path):
    """An imported legacy tree with NO commit marker, when it is the ONLY
    history (no committed runs, no index/batch=* dirs — so it cannot be
    crash residue), must FAIL the stream loudly instead of silently
    classifying the entire imported corpus as fresh (quiet dedup loss).
    Writing the _nb marker heals it in place: the replayed batch then
    classifies against the import."""
    import os

    import pytest

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    tree = _import_legacy_tree(
        spark, str(corpus), 2,
        [(1, "alpha beta gamma", 0), (2, "delta epsilon zeta", 1)],
        write_nb=False,
    )
    assert not os.path.exists(f"{tree}/_SUCCESS")
    assert not os.path.exists(f"{tree}/_nb")

    _feed(src, "b1.json", [
        {"doc_id": 50, "text": "alpha beta gamma"},   # dup of imported 1
        {"doc_id": 51, "text": "brand new text"},
    ])

    def run():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_corpus_dedup_ingest(
            stream, str(corpus), str(ckpt), "doc_id", "text",
            available_now=True, first_batch_id=2,
        )
        q.awaitTermination(120)

    with pytest.raises(Exception, match="neither"):
        run()
    assert os.path.isdir(tree)  # refused to guess: nothing deleted

    with open(f"{tree}/_nb", "w") as fh:  # the documented remediation
        fh.write("2")
    run()  # failed trigger never committed: same batch replays
    log = _log(spark, str(corpus))
    assert log[50] == ("exact_dup", 1)
    assert log[51] == ("fresh", None)


def test_stale_committed_legacy_tree_is_cleaned(spark, tmp_path):
    """Crash residue of the OLD fold (output tree committed, predecessor
    delete never ran → TWO committed upto= trees): the largest is elected,
    classification is unaffected, and the stale tree is deleted on the
    next micro-batch instead of being re-listed forever."""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    # predecessor: covers only doc 1; successor: docs 1+2 (cumulative)
    stale = _import_legacy_tree(
        spark, str(corpus), 1, [(1, "alpha beta gamma", 0)]
    )
    # _import_legacy_tree overwrites data/: write the SUCCESSOR second so
    # data holds both docs, as the old fold's crash window would leave it
    live = _import_legacy_tree(
        spark, str(corpus), 2,
        [(1, "alpha beta gamma", 0), (2, "delta epsilon zeta", 1)],
    )
    assert os.path.isdir(stale) and os.path.isdir(live)

    _feed(src, "b1.json", [
        {"doc_id": 50, "text": "delta epsilon zeta"},  # dup via the LIVE tree
        {"doc_id": 51, "text": "brand new text"},
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_corpus_dedup_ingest(
        stream, str(corpus), str(ckpt), "doc_id", "text",
        available_now=True, first_batch_id=2,
    )
    q.awaitTermination(120)
    log = _log(spark, str(corpus))
    assert log[50] == ("exact_dup", 2)
    assert log[51] == ("fresh", None)
    assert not os.path.exists(stale)   # residue cleanup completed
    assert os.path.isdir(live)         # elected base untouched


def test_tiering_proceeds_during_sliced_merge(spark, tmp_path):
    """While a multi-fold sliced merge is in flight, cap-bounded SMALL-tier
    merges must still run (skipping busy runs) — otherwise every window
    run of the in-flight period accumulates unmerged and the live-run
    count grows O(of) instead of O(log). Sequence engineered so batch 11's
    fold advances slice 2/4 of m10.1 AND merges the two pending window
    runs into m12.0 in the same fold."""
    import os

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    metrics: dict = {}

    def run():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = start_corpus_dedup_ingest(
            stream, str(corpus), str(ckpt), "doc_id", "text",
            available_now=True, compact_every=1, bucket_target_rows=1,
            max_fold_rows=4, metrics=metrics,
        )
        q.awaitTermination(120)

    for b in range(12):
        _feed(src, f"b{b}.json", [
            {"doc_id": 10 * b, "text": f"uniq {b} zero"},
            {"doc_id": 10 * b + 1, "text": f"uniq {b} one"},
        ])
        run()

    root = f"{corpus}/index_compact"
    names = sorted(os.listdir(root))
    last = metrics["fold"][-1]
    # the sliced merge is still in flight ...
    assert last["slice"] == {"id": "m10.1", "slice": 2, "of": 4,
                             "done": False}
    # ... yet the same fold ALSO promoted the two window runs: windows
    # merged away, their merge output committed alongside the slice
    assert "run=m12.0" in names
    assert not any(n.startswith("run=w") for n in names)
    # and per-fold merge work stayed under slice + small-merge volume
    assert all(f["merged_rows"] <= 8 for f in metrics["fold"])

    # classification while slice + adjunct merge coexist: dups of rows
    # living in the in-flight inputs, the completed slices, and the
    # adjunct merge output must all be caught
    _feed(src, "b12.json", [
        {"doc_id": 200, "text": "uniq 0 zero"},    # deep history (slices)
        {"doc_id": 201, "text": "uniq 10 one"},    # in m12.0
        {"doc_id": 202, "text": "uniq 8 zero"},    # in m10.1's inputs
        {"doc_id": 203, "text": "never seen"},
    ])
    run()
    log = _log(spark, str(corpus))
    assert log[200] == ("exact_dup", 0)
    assert log[201] == ("exact_dup", 101)
    assert log[202] == ("exact_dup", 80)
    assert log[203] == ("fresh", None)


_CHAOS_CHILD = '''
import os, signal, sys
sys.path.insert(0, {repo!r})
kill_point, src, corpus, ckpt = sys.argv[1:5]
from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.sources import fsio
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.dedup import (
    start_corpus_dedup_ingest,
)
from pyspark.sql import types as T

orig = fsio.write_text_atomic
def bomb(path, text, spark=None):
    if path.endswith("/_meta"):
        name = path.rsplit("/", 2)[-2]
        if (kill_point == "pre_merge_meta" and name.startswith("run=m")
                and ".s" not in name):
            os.kill(os.getpid(), signal.SIGKILL)
        if kill_point == "pre_slice_meta" and name.endswith(".s1"):
            os.kill(os.getpid(), signal.SIGKILL)
    return orig(path, text, spark)
fsio.write_text_atomic = bomb  # dedup.py resolves fsio.<attr> at call time

spark = get_spark(app_name="chaos-child", master="local[4]",
                  shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
SCHEMA = T.StructType([T.StructField("doc_id", T.LongType()),
                       T.StructField("text", T.StringType())])
stream = (spark.readStream.schema(SCHEMA)
          .option("maxFilesPerTrigger", 1).json(src))
q = start_corpus_dedup_ingest(stream, corpus, ckpt, "doc_id", "text",
    available_now=True, compact_every=1, bucket_target_rows=1,
    max_fold_rows=4)
q.awaitTermination(300)
print("CHILD_FINISHED_WITHOUT_KILL")
'''


def _run_chaos_child(tmp_path, kill_point, src, corpus, ckpt):
    """Run the ingest in a subprocess that SIGKILLs ITSELF (a genuine
    kill -9: no atexit, no JVM shutdown hooks, checkpoint not committed)
    at the requested point. The child is its own session leader; the
    whole process group (including the orphaned JVM) is reaped after."""
    import os
    import signal
    import subprocess
    import sys

    script = tmp_path / "chaos_child.py"
    script.write_text(_CHAOS_CHILD.format(repo=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    log = open(tmp_path / f"chaos_{kill_point}.log", "w")
    p = subprocess.Popen(
        [sys.executable, str(script), kill_point, str(src), str(corpus),
         str(ckpt)],
        stdout=log, stderr=log, start_new_session=True,
    )
    try:
        rc = p.wait(timeout=300)
    finally:
        try:  # reap the orphaned JVM with the rest of the group
            os.killpg(p.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        log.close()
    return rc


def test_kill9_mid_fold_and_mid_slice_recovers(spark, tmp_path):
    """REAL kill -9 chaos (not dir surgery): a subprocess driver is
    SIGKILLed (a) mid-fold right before an unsliced merge's _meta commit,
    then — after recovery — (b) mid-sliced-merge right before the final
    slice's _meta, with max_fold_rows active. After each kill the stream
    resumes from the checkpoint in a fresh session and must replay the
    torn fold: classification of dups across every region of history
    (pre-crash runs, the merge that was torn, rows landed by the killed
    batch itself) stays exact, and the LSM retires the merge inputs as if
    no crash happened."""
    import os
    import signal

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    root = f"{corpus}/index_compact"

    # four 2-row batches: fold@3 writes m4.0 (unsliced merge — kill A
    # fires at its _meta) then starts sliced merge m4.1 (of=2)
    for b in range(4):
        _feed(src, f"b{b}.json", [
            {"doc_id": 10 * b, "text": f"uniq {b} zero"},
            {"doc_id": 10 * b + 1, "text": f"uniq {b} one"},
        ])
    rc = _run_chaos_child(tmp_path, "pre_merge_meta", src, corpus, ckpt)
    assert rc == -signal.SIGKILL
    # torn state: the merge dir landed, its _meta did not
    assert os.path.isdir(f"{root}/run=m4.0")
    assert not os.path.exists(f"{root}/run=m4.0/_meta")

    # recovery in a fresh session (the shared test session): the killed
    # batch replays, the torn dir is overwritten and committed
    _run_sliced(spark, src, corpus, ckpt)
    names = sorted(os.listdir(root))
    assert os.path.exists(f"{root}/run=m4.0/_meta")
    assert "run=m4.1.s0" in names  # sliced merge started, slice 0 done
    log = _log(spark, str(corpus))
    assert log[0] == ("fresh", None) and log[31] == ("fresh", None)

    # kill B: batch 4's fold advances the FINAL slice s1 — die before
    # its _meta (mid-sliced-merge, max_fold_rows active)
    _feed(src, "b4.json", [
        {"doc_id": 100, "text": "uniq 0 zero"},    # dup of pre-crash doc 0
        {"doc_id": 101, "text": "fresh after crash"},
    ])
    rc = _run_chaos_child(tmp_path, "pre_slice_meta", src, corpus, ckpt)
    assert rc == -signal.SIGKILL
    assert not os.path.exists(f"{root}/run=m4.1.s1/_meta")  # torn slice

    _run_sliced(spark, src, corpus, ckpt)  # replay: slice rewritten
    log = _log(spark, str(corpus))
    assert log[100] == ("exact_dup", 0)
    assert log[101] == ("fresh", None)
    names = sorted(os.listdir(root))
    assert "run=m4.1.s0" in names and "run=m4.1.s1" in names
    assert "run=w2" not in names and "run=m4.0" not in names  # retired

    # post-chaos history is fully intact: dups of docs living in the
    # completed slice set, in post-crash landings, and batch-dup logic
    _feed(src, "b5.json", [
        {"doc_id": 200, "text": "uniq 2 one"},           # in the slices
        {"doc_id": 201, "text": "fresh after crash"},    # batch-4 landing
        {"doc_id": 202, "text": "totally new"},
        {"doc_id": 203, "text": "totally new"},          # within-batch dup
    ])
    _run_sliced(spark, src, corpus, ckpt)
    log = _log(spark, str(corpus))
    assert log[200] == ("exact_dup", 21)
    assert log[201] == ("exact_dup", 101)
    assert log[202] == ("fresh", None)
    assert log[203] == ("batch_dup", 202)


def test_import_corpus_index_stamps_after_validation(spark, tmp_path):
    """VERDICT r12 ask #4: the one-call onboarding path for a hand-
    imported marker-less legacy tree. The helper must validate layout
    (bucket-function agreement, batch range) BEFORE stamping the marker,
    be idempotent, refuse malformed trees, and leave the stream able to
    bootstrap via first_batch_id without the unmarked-tree raise."""
    import os

    import pytest

    from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.dedup import (
        import_corpus_index,
    )

    src = tmp_path / "in"; src.mkdir()
    corpus = tmp_path / "corpus"; ckpt = tmp_path / "ckpt"
    tree = _import_legacy_tree(
        spark, str(corpus), 2,
        [(1, "alpha beta gamma", 0), (2, "delta epsilon zeta", 1)],
        write_nb=False,
    )
    assert not os.path.exists(f"{tree}/_nb")

    got = import_corpus_index(spark, str(corpus))
    assert got == tree
    with open(f"{tree}/_nb") as fh:
        assert fh.read() == "2"
    # idempotent: a second call is a no-op returning the committed tree
    assert import_corpus_index(spark, str(corpus)) == tree

    # the stream now bootstraps first try — no raise, import is history
    _feed(src, "b1.json", [
        {"doc_id": 50, "text": "alpha beta gamma"},   # dup of imported 1
        {"doc_id": 51, "text": "brand new text"},
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = start_corpus_dedup_ingest(
        stream, str(corpus), str(ckpt), "doc_id", "text",
        available_now=True, first_batch_id=2,
    )
    q.awaitTermination(120)
    log = _log(spark, str(corpus))
    assert log[50] == ("exact_dup", 1)
    assert log[51] == ("fresh", None)


def test_import_corpus_index_rejects_malformed_trees(spark, tmp_path):
    """The validation teeth: a tree bucketed with the WRONG function (or
    count) must be refused — stamping it would silently lose dup matches
    — and a batch column outside [0, upto) must be refused too."""
    import pytest
    from pyspark.sql import Row

    from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.dedup import (
        import_corpus_index,
    )

    # (a) mis-bucketed: rows land in bucket (pmod+1) — not _bucket_expr
    corpus_a = tmp_path / "a"
    tree_a = f"{corpus_a}/index_compact/upto=2"
    idx = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}", batch=i % 2) for i in range(8)]
    ).select(
        "doc_id", F.xxhash64("text").alias("_h"),
        F.col("batch").cast("int").alias("batch"),
    ).withColumn(
        "bucket",
        F.pmod(F.pmod(F.col("_h"), F.lit(2)) + 1, F.lit(2)).cast("int"),
    )
    idx.write.partitionBy("bucket").parquet(tree_a)
    import os
    for m in ("_SUCCESS",):
        p = f"{tree_a}/{m}"
        if os.path.exists(p):
            os.remove(p)
    with pytest.raises(ValueError, match="bucket"):
        import_corpus_index(spark, str(corpus_a))
    assert not os.path.exists(f"{tree_a}/_nb")  # nothing stamped

    # (b) batch outside [0, upto): the claimed coverage is a lie
    corpus_b = tmp_path / "b"
    tree_b = f"{corpus_b}/index_compact/upto=2"
    bad = spark.createDataFrame(
        [Row(doc_id=1, text="x", batch=5)]
    ).select("doc_id", F.xxhash64("text").alias("_h"),
             F.col("batch").cast("int").alias("batch"))
    bad.coalesce(1).write.parquet(tree_b)
    os.remove(f"{tree_b}/_SUCCESS")
    with pytest.raises(ValueError, match="batch"):
        import_corpus_index(spark, str(corpus_b))

    # (c) no tree at all
    with pytest.raises(ValueError, match="no legacy"):
        import_corpus_index(spark, str(tmp_path / "empty"))
