"""Round-14 optimization internals (guide §2.6/§1.2): the per-shard build
thread pool and the PQ codebook shape memo change HOW work is scheduled /
how often a probe job runs — never what is computed. These tests pin the
bit-identity arguments those optimizations rest on."""

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators import (
    similarity as SIM,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_threaded_shard_build_positional_parity(spark, sf_dir):
    """build_sharded_ivf_index's thread pool must return shards
    POSITIONALLY: shards[s] is exactly build_ivf_index over the
    pmod(xxhash64(id), n)==s slice — the same definition the sequential
    loop implemented (centroids and assignments row-identical)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = 3
    shards = SIM.build_sharded_ivf_index(emb, n_shards=n, n_lists=4)
    assert len(shards) == n
    for s, (cents, asg) in enumerate(shards):
        part = emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n)) == s)
        seq_cents, seq_asg = SIM.build_ivf_index(part, n_lists=4)
        assert _rows(cents) == _rows(seq_cents)
        assert sorted(
            (r["vec_id"], r["list_id"]) for r in asg.collect()
        ) == sorted((r["vec_id"], r["list_id"]) for r in seq_asg.collect())


def test_pq_shape_memo_identity_and_correctness(spark, sf_dir):
    """_pq_shape: a repeated call on the SAME codebook object returns the
    memoized tuple; a DIFFERENT object over the same data recomputes and
    agrees — identity can change job count, never the answer."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, _codes = SIM.pq_index(emb, m=4, k=16)
    cents = cents.localCheckpoint()
    # hermetic: snapshot/restore the module-level memo so this test neither
    # sees nor leaks cross-test state (ADVICE r14)
    saved = dict(SIM._PQ_SHAPE_MEMO)
    SIM._PQ_SHAPE_MEMO.clear()
    try:
        first = SIM._pq_shape(cents)
        assert first[0] == 4 and first[1] == 16 and first[0] * first[2] == 64
        # memo hit: same object is cached now
        assert cents in SIM._PQ_SHAPE_MEMO
        assert SIM._pq_shape(cents) == first
        # distinct object over identical data: misses the memo, same shape
        cents2, _ = SIM.pq_index(emb, m=4, k=16)
        assert SIM._pq_shape(cents2) == first
    finally:
        SIM._PQ_SHAPE_MEMO.clear()
        SIM._PQ_SHAPE_MEMO.update(saved)


def test_par_helper_order_and_values():
    """_par returns thunk results in THUNK order regardless of completion
    order (the property every face fan-out relies on)."""
    import time

    from aws_dataset_ingestion_metrics_collection_framework_spark.plans.queries import (
        _par,
    )

    def slow():
        time.sleep(0.2)
        return "slow"

    out = _par(slow, lambda: "fast", lambda: 3)
    assert out == ["slow", "fast", 3]
    assert _par(lambda: "only") == ["only"]
