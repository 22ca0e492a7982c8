"""Product quantization (similarity.pq_index / pq_ann_topk): integer
fixed-point determinism, code-table shape, ADC recall on clusterable data,
and tie-break totality. The full cross-engine replay (seeding, Lloyd step,
encoding, ADC) is pinned by the pq_ann DuckDB oracle."""

import random

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
    brute_force_topk,
    pq_ann_topk,
    pq_index,
)


def _clustered(spark, n_clusters=8, per_cluster=30, dim=32, noise=0.02):
    """Vectors = cluster archetype + small deterministic noise — the
    structure PQ is supposed to exploit."""
    rng = random.Random(5)
    cents = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows = []
    i = 0
    for c, cent in enumerate(cents):
        for _ in range(per_cluster):
            rows.append((i, c, [v + rng.uniform(-noise, noise) for v in cent]))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )


class TestPqIndex:
    def test_codes_shape_and_range(self, spark):
        df = _clustered(spark)
        cents, codes = pq_index(df, m=4, k=16)
        n = df.count()
        assert codes.count() == n * 4
        stats = codes.agg(
            F.min("code"), F.max("code"), F.countDistinct("sub")
        ).collect()[0]
        assert stats[0] >= 0 and stats[1] < 16 and stats[2] == 4
        # centroid table is complete: m*k rows, all vectors length dim/m
        crows = cents.collect()
        assert len(crows) == 4 * 16
        assert all(len(r["cvec"]) == 8 for r in crows)

    def test_partition_invariant_exact(self, spark):
        df = _clustered(spark, n_clusters=4, per_cluster=20)
        _, a = pq_index(df, m=4, k=8)
        _, b = pq_index(df.repartition(17), m=4, k=8)
        ka = {(r["vec_id"], r["sub"]): r["code"] for r in a.collect()}
        kb = {(r["vec_id"], r["sub"]): r["code"] for r in b.collect()}
        assert ka == kb  # integer arithmetic: exact, order-independent

    def test_duplicate_vectors_share_codes(self, spark):
        base = _clustered(spark, n_clusters=2, per_cluster=5)
        dup = base.withColumn("vec_id", F.col("vec_id") + 1000)
        _, codes = pq_index(base.unionByName(dup), m=2, k=4)
        by_id = {}
        for r in codes.collect():
            by_id.setdefault(r["vec_id"], {})[r["sub"]] = r["code"]
        for i in range(10):
            assert by_id[i] == by_id[i + 1000]


class TestPqAnn:
    def test_recall_on_clustered_data(self, spark):
        """PQ's real contract on clustered data is SET recovery, not
        within-cluster ranking: quantization collapses a tight cluster
        onto shared codes, so ADC distances inside it tie (ranking there
        is id-tie-broken by design). With 4 members per cluster and
        top-4 retrieval, the retrieved SET must equal the brute-force
        set exactly (the query's own cluster), and every hit must stay
        in the query's cluster."""
        df = _clustered(spark, n_clusters=8, per_cluster=5)
        q = df.filter(F.col("vec_id") % 5 == 0)  # one query per cluster
        ann = pq_ann_topk(q, df, k_neighbors=4, m=4, k=16)
        brute = brute_force_topk(q, df, k=4)
        bp = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
        ap = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
        assert ap == bp
        cl = {r["vec_id"]: r["cluster"] for r in df.collect()}
        assert all(cl[a] == cl[b] for a, b in ap)

    def test_output_contract(self, spark):
        df = _clustered(spark, n_clusters=3, per_cluster=10)
        out = pq_ann_topk(df.filter(F.col("vec_id") < 2), df,
                          k_neighbors=3, m=4, k=8)
        rows = out.collect()
        by_q = {}
        for r in rows:
            assert r["query_id"] != r["neighbor_id"]
            by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["adc_dist"], r["neighbor_id"])
            )
        for q, lst in by_q.items():
            lst.sort()
            assert [t[0] for t in lst] == [1, 2, 3]
            dists = [t[1] for t in lst]
            assert dists == sorted(dists)

    def test_md5_variant_matches_xx_shape(self, spark):
        """Both hash variants produce complete, valid top-k tables (the
        md5 variant is the oracle face; values differ, contracts don't)."""
        df = _clustered(spark, n_clusters=4, per_cluster=10)
        q = df.filter(F.col("vec_id") < 3)
        for fn in ("xx", "md5"):
            out = pq_ann_topk(q, df, k_neighbors=4, m=4, k=8, hash_fn=fn)
            assert out.count() == 3 * 4


class TestHardNegatives:
    def test_positives_excluded_and_rank_dense(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
            brute_force_topk,
            mine_hard_negatives,
        )

        df = _clustered(spark, n_clusters=4, per_cluster=10)
        q = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # positives: the top-2 exact neighbors per query
        pos = brute_force_topk(
            df.filter(F.col("vec_id") < 3), df, k=2
        ).select("query_id", F.col("neighbor_id").alias("vec_id"))
        out = mine_hard_negatives(q, df, pos, k=4)
        rows = out.collect()
        pos_set = {(r["query_id"], r["vec_id"]) for r in pos.collect()}
        by_q = {}
        for r in rows:
            assert (r["query_id"], r["neighbor_id"]) not in pos_set
            assert r["query_id"] != r["neighbor_id"]
            by_q.setdefault(r["query_id"], []).append(r["neg_rank"])
        for ranks in by_q.values():
            assert sorted(ranks) == [1, 2, 3, 4]  # dense after exclusion
        # negatives = exact ranks 3..6 (top-2 are the positives)
        full = brute_force_topk(df.filter(F.col("vec_id") < 3), df, k=6)
        want = {(r["query_id"], r["neighbor_id"])
                for r in full.collect() if r["rank"] > 2}
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        assert got == want

    def test_lsh_method_produces_valid_negatives(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.similarity import (
            mine_hard_negatives,
        )

        df = _clustered(spark, n_clusters=4, per_cluster=10, dim=16)
        q = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        pos = spark.createDataFrame(
            [(0, 1), (1, 2)], "query_id long, vec_id long"
        )
        out = mine_hard_negatives(
            q, df, pos, k=3, method="lsh", n_planes=2, n_tables=8
        )
        rows = out.collect()
        assert {(r["query_id"], r["neighbor_id"]) for r in rows}.isdisjoint(
            {(0, 1), (1, 2)}
        )
        assert all(r["neg_rank"] <= 3 for r in rows)


class TestPqDimCheck:
    def test_indivisible_dim_raises(self, spark):
        """dim % m != 0 must fail loudly, not silently truncate the tail
        dimensions out of training/encoding/ADC scoring."""
        import pytest as _pytest

        df = spark.createDataFrame(
            [(0, [0.1, 0.2, 0.3, 0.4, 0.5])],
            "vec_id long, embedding array<double>",
        )
        with _pytest.raises(Exception) as ei:
            pq_index(df, m=4, k=2)
        assert "not divisible" in str(ei.value)
