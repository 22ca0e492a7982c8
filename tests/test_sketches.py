"""KMV sketch pins: exactness below k, estimator accuracy vs ground truth
on real corpus data, union-mergeability, and determinism across partition
counts (the retry/repartition-stability contract every sketch needs)."""

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import (
    md5_60bit,
    tokenize,
    word_shingles,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import sketches as SK


def _distinct_shingles(df):
    return df.select(
        F.explode(word_shingles(tokenize(F.col("text")), 3)).alias("s")
    ).distinct()


def test_below_k_sketch_is_exact(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "v long")
    hashes = df.select(md5_60bit(F.col("v").cast("string")).alias("h"))
    out = SK.kmv_compare(SK.kmv_sketch(hashes, 256), SK.kmv_sketch(hashes, 256), 256)
    row = out.collect()[0]
    # identical small sets: exact distinct count, jaccard exactly 1
    assert row["n_a"] == 50 and row["est_distinct_a"] == 50.0
    assert row["est_jaccard"] == 1.0


def test_disjoint_sets_estimate_zero(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "v string")
    ha = a.select(md5_60bit(F.col("v")).alias("h"))
    hb = b.select(md5_60bit(F.col("v")).alias("h"))
    row = SK.kmv_compare(SK.kmv_sketch(ha, 128), SK.kmv_sketch(hb, 128), 128).collect()[0]
    assert row["est_jaccard"] == 0.0


def test_estimators_against_ground_truth(spark, sf_dir):
    """Real corpus halves: KMV distinct estimate within 3/sqrt(k) relative
    error of the true count, Jaccard estimate within 4 standard errors of
    the true overlap (documents share a finite word vocabulary, so the true
    3-gram overlap between halves is well above zero)."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    k = 256
    row = SK.corpus_overlap(a, b, "text", k=k).collect()[0]

    sa = _distinct_shingles(a)
    sb = _distinct_shingles(b)
    true_a = sa.count()
    true_b = sb.count()
    inter = sa.intersect(sb).count()
    union = true_a + true_b - inter
    true_j = inter / union

    rel = 3.0 / (k ** 0.5)
    assert abs(row["est_distinct_a"] - true_a) <= rel * true_a
    assert abs(row["est_distinct_b"] - true_b) <= rel * true_b
    assert abs(row["est_jaccard"] - true_j) <= 4.0 / (k ** 0.5)
    assert true_j > 0.05  # the check above is non-vacuous


def test_union_mergeability(spark):
    """kmv(A ∪ B) == kmv(kmv(A) ∪ kmv(B)) — the property that lets
    per-shard sketches roll up without revisiting data."""
    a = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "v string")
    b = spark.createDataFrame([(f"y{i}",) for i in range(2000)], "v string")
    ha = a.select(md5_60bit(F.col("v")).alias("h"))
    hb = b.select(md5_60bit(F.col("v")).alias("h"))
    k = 64
    direct = SK.kmv_sketch(ha.union(hb), k)
    merged = SK.kmv_sketch(SK.kmv_sketch(ha, k).union(SK.kmv_sketch(hb, k)), k)
    assert sorted(r["h"] for r in direct.collect()) == sorted(
        r["h"] for r in merged.collect()
    )


def test_partitioning_invariance(spark):
    vals = spark.createDataFrame([(f"v{i}",) for i in range(5000)], "v string")
    h = vals.select(md5_60bit(F.col("v")).alias("h"))
    one = sorted(r["h"] for r in SK.kmv_sketch(h.repartition(1), 32).collect())
    many = sorted(r["h"] for r in SK.kmv_sketch(h.repartition(17), 32).collect())
    assert one == many
