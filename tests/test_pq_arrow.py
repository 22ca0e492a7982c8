"""Arrow exact-int64 PQ assign kernel (similarity._pq_assign_arrow):
bit-parity with the HOF path — codes, d2, trained centroids, end-to-end
ADC rankings — including the tie rule and null-vector degradation. The
kernel changes the execution strategy (one vectorized numpy argmin per
Arrow batch instead of an interpreted expression per element), never the
results; these tests are the proof the ``pq_ann_arrow`` face leans on
when it reuses the HOF face's DuckDB oracle verbatim."""

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
    _pq_assign,
    _pq_subslices,
    build_ivfpq_index,
    pq_ann_topk,
    pq_index,
)
from tests.test_pq import _clustered


def _codes_set(codes):
    return {tuple(r) for r in codes.select("vec_id", "sub", "code").collect()}


def _cent_set(cents):
    return {
        (r["sub"], r["idx"], tuple(r["cvec"])) for r in cents.collect()
    }


class TestArrowAssignParity:
    def test_pq_index_bit_parity_both_hashes(self, spark):
        df = _clustered(spark)
        for hash_fn in ("xx", "md5"):
            c_hof, k_hof = pq_index(df, m=4, k=16, hash_fn=hash_fn)
            c_arr, k_arr = pq_index(
                df, m=4, k=16, hash_fn=hash_fn, assign_kernel="arrow"
            )
            # the Lloyd update consumes the assign output, so centroid
            # equality proves the TRAINING pass matched, code equality
            # the ENCODE pass
            assert _cent_set(c_hof) == _cent_set(c_arr)
            assert _codes_set(k_hof) == _codes_set(k_arr)

    def test_assign_d2_and_null_vector_parity(self, spark):
        df = spark.createDataFrame(
            [
                (0, [1.0, 2.0, 3.0, 4.0]),
                (1, [4.0, 3.0, 2.0, 1.0]),
                (2, None),
                (3, [0.0, 0.0, 0.0, 0.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        cents, _ = pq_index(
            df.filter(F.col("embedding").isNotNull()), m=2, k=2
        )
        slices = _pq_subslices(df, "vec_id", "embedding", 2, 20, "cid")
        rows_hof = sorted(
            (
                r["cid"], r["sub"], tuple(r["svec"]) if r["svec"] else None,
                r["code"], r["d2"],
            )
            for r in _pq_assign(slices, cents, "cid").collect()
        )
        rows_arr = sorted(
            (
                r["cid"], r["sub"], tuple(r["svec"]) if r["svec"] else None,
                r["code"], r["d2"],
            )
            for r in _pq_assign(slices, cents, "cid", kernel="arrow").collect()
        )
        assert rows_hof == rows_arr
        # the null vector's rows are present in both, d2 null
        null_rows = [r for r in rows_arr if r[2] is None]
        assert null_rows and all(r[4] is None for r in null_rows)

    def test_tie_rule_smaller_index_wins(self, spark):
        # every vector identical -> every centroid identical -> all d2
        # tie -> the argmin must collapse to idx 0 in BOTH kernels
        df = spark.createDataFrame(
            [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(6)],
            "vec_id long, embedding array<double>",
        )
        for kernel in ("hof", "arrow"):
            _, codes = pq_index(df, m=2, k=4, assign_kernel=kernel)
            assert codes.filter(F.col("code") != 0).count() == 0, kernel

    def test_pq_ann_topk_end_to_end_parity(self, spark):
        df = _clustered(spark, n_clusters=4, per_cluster=12)
        out_hof = pq_ann_topk(
            df.filter(F.col("vec_id") < 5), df, k_neighbors=5, hash_fn="md5"
        ).collect()
        out_arr = pq_ann_topk(
            df.filter(F.col("vec_id") < 5), df, k_neighbors=5, hash_fn="md5",
            assign_kernel="arrow",
        ).collect()
        assert sorted(map(tuple, out_hof)) == sorted(map(tuple, out_arr))

    def test_ivfpq_build_parity(self, spark):
        df = _clustered(spark, n_clusters=4, per_cluster=12)
        _, pqc_h, ent_h = build_ivfpq_index(df, n_lists=4, m=4, pq_k=8)
        _, pqc_a, ent_a = build_ivfpq_index(
            df, n_lists=4, m=4, pq_k=8, assign_kernel="arrow"
        )
        assert _cent_set(pqc_h) == _cent_set(pqc_a)
        ent = lambda e: sorted(
            (r["vec_id"], r["list_id"], tuple(r["codes"]))
            for r in e.select("vec_id", "list_id", "codes").collect()
        )
        assert ent(ent_h) == ent(ent_a)

    def test_unknown_kernel_raises(self, spark):
        df = _clustered(spark, n_clusters=2, per_cluster=4)
        try:
            pq_index(df, m=4, k=4, assign_kernel="simd")
            assert False, "expected ValueError"
        except ValueError as e:
            assert "kernel" in str(e)
