"""materialize_index (operators/similarity.py, r14 optimization round):
localCheckpoint-pinning a freshly built in-memory index must preserve the
structure AND the result rows bit-for-bit — it only changes how often the
build lineage is computed, never what it computes. Exercised over all
three built-index shapes (IVF pair, IVF-PQ triple, sharded list)."""

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
    build_ivf_index,
    build_ivfpq_index,
    build_sharded_ivf_index,
    build_sharded_ivfpq_index,
    ivf_ann_topk,
    ivfpq_ann_topk,
    materialize_index,
    pq_index,
    pq_ann_topk,
    sharded_ivf_ann_topk,
    sharded_ivfpq_ann_topk,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_materialized_ivf_pair_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 6)
    raw = build_ivf_index(emb, n_lists=4)
    mat = materialize_index(build_ivf_index(emb, n_lists=4))
    assert isinstance(mat, tuple) and len(mat) == 2
    assert _rows(mat[0]) == _rows(raw[0])  # centroids
    assert _rows(
        mat[1].select("vec_id", "list_id")
    ) == _rows(raw[1].select("vec_id", "list_id"))
    assert _rows(
        ivf_ann_topk(queries, emb, k=3, n_probe=3, index=mat, scorer="hof")
    ) == _rows(
        ivf_ann_topk(queries, emb, k=3, n_probe=3, index=raw, scorer="hof")
    )


def test_materialized_pq_pair_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 6)
    raw = pq_index(emb, m=4)
    mat = materialize_index(pq_index(emb, m=4))
    assert _rows(
        pq_ann_topk(queries, emb, k_neighbors=3, m=4, index=mat)
    ) == _rows(pq_ann_topk(queries, emb, k_neighbors=3, m=4, index=raw))


def test_materialized_ivfpq_triple_and_sharded_list_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 6)
    raw3 = build_ivfpq_index(emb, n_lists=4, m=4, pq_k=8)
    mat3 = materialize_index(build_ivfpq_index(emb, n_lists=4, m=4, pq_k=8))
    assert isinstance(mat3, tuple) and len(mat3) == 3
    assert _rows(
        ivfpq_ann_topk(queries, mat3, k=3, n_probe=3, scorer="hof")
    ) == _rows(ivfpq_ann_topk(queries, raw3, k=3, n_probe=3, scorer="hof"))

    raw_sh = build_sharded_ivf_index(emb, n_shards=2, n_lists=4)
    mat_sh = materialize_index(build_sharded_ivf_index(emb, n_shards=2, n_lists=4))
    assert isinstance(mat_sh, list) and len(mat_sh) == 2
    assert all(isinstance(t, tuple) and len(t) == 2 for t in mat_sh)
    assert _rows(
        sharded_ivf_ann_topk(queries, mat_sh, k=3, n_probe=4, scorer="hof")
    ) == _rows(
        sharded_ivf_ann_topk(queries, raw_sh, k=3, n_probe=4, scorer="hof")
    )


def test_materialized_sharded_ivfpq_nested_shape_identical(spark, sf_dir):
    # the (pq_centroids, [(cents, entries), ...]) shape: a tuple whose
    # second element is a LIST — materialize_index must recurse into both
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 6)
    raw = build_sharded_ivfpq_index(emb, n_shards=2, n_lists=4, m=4, pq_k=8)
    mat = materialize_index(
        build_sharded_ivfpq_index(emb, n_shards=2, n_lists=4, m=4, pq_k=8)
    )
    assert isinstance(mat, tuple) and len(mat) == 2
    assert isinstance(mat[1], list) and len(mat[1]) == 2
    assert all(isinstance(t, tuple) and len(t) == 2 for t in mat[1])
    assert _rows(
        sharded_ivfpq_ann_topk(queries, mat, k=3, n_probe=4, scorer="hof")
    ) == _rows(
        sharded_ivfpq_ann_topk(queries, raw, k=3, n_probe=4, scorer="hof")
    )
