"""MLlib quality classifier pins — the correctness contract for the
rows-only ``quality_scores`` registry entry: separable labels are learned
(AUC ≈ 1), scoring generalizes to held-out docs, refitting on identical
data reproduces identical scores, and the score schema is stable."""

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import mlquality as ML


@pytest.fixture(scope="module")
def labeled_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn(
        "label",
        (F.col("text").contains("spark") | F.col("text").contains("agg")).cast(
            "double"
        ),
    )


def test_learns_separable_signal(spark, labeled_docs):
    train = labeled_docs.filter(F.col("doc_id") % 5 != 0)
    model = ML.train_quality_classifier(train, "text", "label")
    row = ML.quality_report(model, train, "label").collect()[0]
    assert row["auc"] > 0.97
    assert 0 < row["n_pos"] < row["n_train"]  # both classes present


def test_generalizes_to_holdout(spark, labeled_docs):
    train = labeled_docs.filter(F.col("doc_id") % 5 != 0)
    hold = labeled_docs.filter(F.col("doc_id") % 5 == 0)
    model = ML.train_quality_classifier(train, "text", "label")
    scored = ML.score_quality(model, hold, "doc_id").join(
        hold.select("doc_id", "label"), "doc_id"
    )
    agree = scored.filter(
        F.col("predicted") == F.col("label").cast("int")
    ).count()
    assert agree / scored.count() > 0.9


def test_refit_is_deterministic(spark, labeled_docs):
    train = labeled_docs.filter(F.col("doc_id") % 5 != 0)

    def fit_scores():
        m = ML.train_quality_classifier(train, "text", "label")
        return sorted(
            (r["doc_id"], r["quality_score"])
            for r in ML.score_quality(m, labeled_docs, "doc_id").collect()
        )

    assert fit_scores() == fit_scores()


def test_score_schema_and_range(spark, labeled_docs):
    model = ML.train_quality_classifier(labeled_docs, "text", "label")
    out = ML.score_quality(model, labeled_docs, "doc_id")
    assert [f.name for f in out.schema] == ["doc_id", "quality_score", "predicted"]
    rows = out.collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert all(r["predicted"] in (0, 1) for r in rows)
