"""DSIR importance-weighting tests (operators/weighting.py)."""

from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.weighting import (
    importance_weights,
)

SCHEMA = "doc_id long, text string, domain string"


def _corpus(spark):
    # target vocabulary {spark, shuffle}; off-target {cobol, mainframe};
    # doc 5 is empty, doc 6 mixes both.
    rows = [
        (0, "spark shuffle spark shuffle spark", "tgt"),
        (1, "spark shuffle shuffle spark", "tgt"),
        (2, "cobol mainframe cobol mainframe", "raw"),
        (3, "cobol mainframe mainframe cobol cobol", "raw"),
        (4, "spark shuffle spark", "raw"),          # target-like but unlabeled
        (5, "", "raw"),
        (6, "spark cobol", "raw"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_target_like_docs_score_higher(spark):
    w = importance_weights(
        _corpus(spark), "doc_id", "text", F.col("domain") == "tgt",
        n_max=2, buckets=64,
    )
    rows = {r["doc_id"]: r for r in w.collect()}
    # per-gram normalization isn't applied, but the target-vocab doc must
    # beat the off-target doc of comparable length decisively (absolute sign
    # is smoothing-dependent on a tiny corpus; the margin is what matters)
    assert rows[4]["weight"] > rows[2]["weight"] + 5.0
    # mixed doc sits between the pure ones
    assert rows[2]["weight"] < rows[6]["weight"] < rows[4]["weight"]


def test_empty_doc_gets_zero_weight_and_gram_counts(spark):
    w = importance_weights(
        _corpus(spark), "doc_id", "text", F.col("domain") == "tgt", n_max=2,
        buckets=64,
    )
    rows = {r["doc_id"]: r for r in w.collect()}
    assert rows[5]["weight"] == 0.0 and rows[5]["n_grams"] == 0
    # n_grams = tokens + bigrams = 2·len − 1
    assert rows[0]["n_grams"] == 5 + 4
    assert rows[6]["n_grams"] == 2 + 1


def test_weights_stable_under_repartitioning(spark):
    base = _corpus(spark)
    w1 = importance_weights(base, "doc_id", "text", F.col("domain") == "tgt",
                            buckets=64)
    w2 = importance_weights(base.repartition(7), "doc_id", "text",
                            F.col("domain") == "tgt", buckets=64)
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))
